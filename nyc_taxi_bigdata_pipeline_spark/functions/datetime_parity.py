"""Datetime helpers with Postgres-convention parity.

The reference warehouse uses Postgres ``EXTRACT(DOW)`` (0=Sunday..6,
``dw_load_incremental.sql:34-42``) and a Postgres TIME-typed
``dim_time.time_id`` (``dw_creation.sql:15-16``). Spark has neither
convention natively (SURVEY §2.8, §7.3), so they live here once.
"""

from __future__ import annotations

from datetime import date

import pyspark.sql.functions as F
from pyspark.sql import Column


def dow_pg(col: Column | str) -> Column:
    """Postgres EXTRACT(DOW): 0=Sunday .. 6=Saturday.

    Spark ``dayofweek`` is 1=Sunday..7 → subtract 1. (DuckDB's
    ``dayofweek`` already matches Postgres.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.dayofweek(c) - F.lit(1)).alias("day_of_week")


def time_key(ts: Column | str) -> Column:
    """Postgres TIME surrogate: 'HH:mm' string key (SURVEY §7.3)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "HH:mm")


def month_window(year: int, month: int) -> tuple[str, str]:
    """[start, next-month-start) literals for the strict month filter (P3,
    ``Ex02DataIngestion.scala:33-42``)."""
    start = date(year, month, 1)
    nxt = date(year + 1, 1, 1) if month == 12 else date(year, month + 1, 1)
    return start.isoformat(), nxt.isoformat()


def sliding_months(year: int, month: int, n: int = 3) -> list[tuple[int, int]]:
    """The n months preceding (year, month), oldest first — the ML
    sliding training window incl. year-boundary wrap
    (``model_registry.py:386-418``)."""
    out: list[tuple[int, int]] = []
    y, m = year, month
    for _ in range(n):
        m -= 1
        if m == 0:
            y, m = y - 1, 12
        out.append((y, m))
    return list(reversed(out))
