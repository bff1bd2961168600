"""Driver-side HTTP fetch + availability probe (S1, Q1).

Reference parity: ``Ex01DataRetrieval.scala:63-77`` downloads monthly
TLC parquet with an idempotent skip-if-present; the Airflow DAG probes
the URL with HEAD before scheduling the month
(``full_pipeline_dag.py:101-127``). Driver-side on purpose — fetching a
source file is control-plane work, not data-plane (SURVEY §2.1).

Stdlib-only (urllib); no external HTTP deps.
"""

from __future__ import annotations

import urllib.error
import urllib.request
from pathlib import Path

TLC_URL_TEMPLATE = (
    "https://d37ci6vzurychx.cloudfront.net/trip-data/yellow_tripdata_{year}-{month:02d}.parquet"
)


def monthly_url(year: int, month: int, template: str = TLC_URL_TEMPLATE) -> str:
    return template.format(year=year, month=month)


def probe_available(url: str, timeout: float = 10.0) -> bool:
    """Q1: HEAD probe; False on 4xx/5xx or network failure (the DAG
    short-circuits the month in that case)."""
    req = urllib.request.Request(url, method="HEAD")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return 200 <= resp.status < 300
    except (urllib.error.URLError, OSError):
        return False


def fetch_if_absent(url: str, dest: str | Path, timeout: float = 60.0) -> tuple[Path, bool]:
    """S1: idempotent download — skip when the destination exists.
    Returns (path, downloaded?). Writes via a temp file so a partial
    download never masquerades as a complete one."""
    dest = Path(dest)
    if dest.exists() and dest.stat().st_size > 0:
        return dest, False
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as out:
        while chunk := resp.read(1 << 20):
            out.write(chunk)
    tmp.rename(dest)
    return dest, True
