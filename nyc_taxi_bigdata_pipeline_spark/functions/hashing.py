"""Portable hashing primitives for dedup/similarity operators.

All hashes bottom out in :func:`compat.h64` (md5-hex → int64) so the
DuckDB oracle can reproduce them bit-for-bit. Spark's native xxhash64/
murmur are faster but engine-private; the oracle-checked operators pay
the md5 cost for verifiability, and the scale path (MinHashLSH etc.)
can swap in xxhash64 behind the same interface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from .compat import h64_spark

# Mersenne prime 2^61-1: modulus for the minhash permutation family.
MERSENNE_61 = (1 << 61) - 1


def h64_col(col: Column | str) -> Column:
    """Deterministic 64-bit hash of a string column (oracle-portable)."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise TypeError("h64_col needs a column *name* (shared-SQL build)")
    return F.expr(h64_spark(name))


def minhash_perm_sql(hash_expr: str, a: int, b: int) -> str:
    """One universal-hash permutation ((a*h + b) mod M61) as shared SQL.

    Operates on a non-negative 60-bit base hash; the multiply is done in
    DOUBLE-free integer arithmetic via split-multiply to avoid int64
    overflow divergence: both engines wrap on overflow the same way for
    BIGINT, but DuckDB raises on overflow instead — so we keep operands
    small: (a mod M) * h fits in ~122 bits → must split. We instead use
    ((a mod 2^30)*h + b) mod M61 with a < 2^30 so a*h < 2^90... still
    overflows. Final choice: hash the *string concat* of seed and value
    through md5 again — no arithmetic, no overflow, trivially portable.
    """
    raise NotImplementedError("use seeded_h64_sql — kept for docs")


def seeded_h64_sql(expr: str, seed: int) -> str:
    """Seeded portable 64-bit hash: md5 over seed-prefixed value.

    Avoids modular arithmetic entirely (int64 overflow semantics differ:
    Spark wraps, DuckDB errors), so each minhash "permutation" is an
    independent md5 family member. Costlier than (a*h+b) mod p but
    bit-portable across engines.
    """
    return f"CAST(CONCAT('0x', SUBSTRING(MD5(CONCAT('{seed}#', {expr})), 1, 15)) AS BIGINT)"


def seeded_h64_spark_sql(expr: str, seed: int) -> str:
    return f"CAST(CONV(SUBSTRING(MD5(CONCAT('{seed}#', {expr})), 1, 15), 16, 10) AS BIGINT)"


def xxhash64_fast(*cols: Column | str) -> Column:
    """Scale-path hash (JVM xxhash64) for operators that don't need an
    external oracle (e.g. salting, internal bucketing)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])
