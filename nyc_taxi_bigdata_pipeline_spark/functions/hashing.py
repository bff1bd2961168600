"""Portable hashing primitives for dedup/similarity operators.

All hashes bottom out in :func:`compat.h64` (md5-hex → int64) so the
DuckDB oracle can reproduce them bit-for-bit. Spark's native xxhash64/
murmur are faster but engine-private; the oracle-checked operators pay
the md5 cost for verifiability, and the scale path (operators/dedup.py)
swaps in xxhash64 behind the same interface.

Seeding is done by PREFIXING the seed into the hashed string rather
than with an (a*h+b) mod p permutation family: the 122-bit intermediate
product would need split-multiply arithmetic whose overflow semantics
differ across engines (Spark wraps BIGINT, DuckDB raises). Prefix-md5
is costlier but trivially bit-portable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .compat import h64_spark


def h64_col(col: str) -> Column:
    """Deterministic 64-bit hash of a string column (oracle-portable)."""
    return F.expr(h64_spark(col))


def seeded_h64_sql(expr: str, seed: int) -> str:
    """Seeded portable 64-bit hash, DuckDB dialect."""
    return f"CAST(CONCAT('0x', SUBSTRING(MD5(CONCAT('{seed}#', {expr})), 1, 15)) AS BIGINT)"


def seeded_h64_spark_sql(expr: str, seed: int) -> str:
    """Seeded portable 64-bit hash, Spark SQL dialect."""
    return f"CAST(CONV(SUBSTRING(MD5(CONCAT('{seed}#', {expr})), 1, 15), 16, 10) AS BIGINT)"


def xxhash64_fast(*cols: Column | str) -> Column:
    """Scale-path hash (JVM xxhash64) for operators that don't need an
    external oracle (e.g. salting, internal bucketing)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])
