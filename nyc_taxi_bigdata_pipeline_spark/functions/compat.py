"""Cross-engine-deterministic SQL expression fragments.

The correctness gate hash-compares Spark results against a DuckDB oracle,
so every aggregate we emit must be *bit-identical* across engines. Floating
point SUM/AVG over doubles is partition-order-dependent in Spark and
engine-internal-order-dependent in DuckDB, so raw double aggregation can
never hash-match. The fixes, verified empirically on this container:

- **Exact decimal sums.** The testdata money/rate doubles carry ≤2 exact
  decimal digits, so ``CAST(x AS DECIMAL(p,2))`` is lossless in both
  engines and decimal SUM is exact/associative → identical in any order.
  ``o_totalprice`` carries up to ~4 digits → DECIMAL(18,6) (its true
  values sit ≥5e-7 away from any 6th-digit rounding boundary, so the
  double→decimal rounding-rule difference between engines can't bite).
- **Never CAST double→int directly**: DuckDB rounds, Spark truncates.
  Always go through FLOOR/ROUND first.
- **Derived doubles** (avg, stddev, interpolations) are computed FROM the
  exact decimal sums with textually identical double arithmetic — IEEE ops
  on identical operands give identical bits in both engines.
- **Portable 64-bit hash**: first 15 hex digits of md5 → int64; Spark
  ``conv(...,16,10)`` ≡ DuckDB ``CAST('0x'||... AS BIGINT)`` (verified
  equal).
- **2^53 caveat**: the final decimal→double CAST is exact only while the
  *scaled* sum fits in a double's mantissa (|sum|·10^scale < 2^53 ≈ 9e15
  — true for every testdata SF here). Beyond that, Java correctly-rounds
  while DuckDB divides-then-rounds, so derived statistics built from
  very large sums must ROUND their outputs (see ml_linreg_closed_form).

Each helper returns ANSI-SQL *text* usable verbatim in a Spark
``F.expr``/``spark.sql`` and in the DuckDB oracle — one source of truth
for both sides of the comparison.
"""

from __future__ import annotations

MONEY = "DECIMAL(12,2)"  # 2-exact-decimal doubles (prices, balances, values)
RATE = "DECIMAL(4,2)"    # small 2-decimal rates (discount, tax)
FINE = "DECIMAL(18,6)"   # doubles with ≤4 true decimal digits (o_totalprice)


def money(col: str) -> str:
    return f"CAST({col} AS {MONEY})"


def rate(col: str) -> str:
    return f"CAST({col} AS {RATE})"


def fine(col: str) -> str:
    return f"CAST({col} AS {FINE})"


def sum_exact(dec_expr: str, alias: str) -> str:
    """Exact decimal SUM surfaced as double (deterministic both engines)."""
    return f"CAST(SUM({dec_expr}) AS DOUBLE) AS {alias}"


def avg_exact(dec_expr: str, count_col: str, alias: str) -> str:
    """AVG as exact-decimal-sum ÷ count; identical double division."""
    return f"CAST(SUM({dec_expr}) AS DOUBLE) / COUNT({count_col}) AS {alias}"


def sum_int(expr: str, alias: str) -> str:
    """Integer SUM pinned to BIGINT (DuckDB would widen to HUGEINT)."""
    return f"CAST(SUM({expr}) AS BIGINT) AS {alias}"


def count_star(alias: str = "cnt") -> str:
    return f"COUNT(*) AS {alias}"


def stddev_exact(col: str, dec: str = MONEY, alias: str = "std") -> str:
    """Sample stddev from exact decimal moments.

    sqrt((Σx² − (Σx)²/n)/(n−1)) where Σx and Σx² are exact decimal sums;
    the outer double arithmetic is textually identical across engines.
    Parity with A11 ``F.stddev`` (``error_analysis.py:176-182``).
    """
    s1 = f"CAST(SUM(CAST({col} AS {dec})) AS DOUBLE)"
    s2 = f"CAST(SUM(CAST({col} AS {dec}) * CAST({col} AS {dec})) AS DOUBLE)"
    n = f"COUNT({col})"
    return f"SQRT(({s2} - ({s1} * {s1}) / {n}) / ({n} - 1)) AS {alias}"


def null_count(col: str, alias: str) -> str:
    """A9-style null profile cell (notebook cell 5 of the reference EDA)."""
    return f"CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {alias}"


def neg_count(col: str, alias: str) -> str:
    """A10-style negative-value profile cell (notebook cell 7)."""
    return f"CAST(SUM(CASE WHEN {col} < 0 THEN 1 ELSE 0 END) AS BIGINT) AS {alias}"


def h64(expr: str) -> str:
    """Portable deterministic 64-bit hash of a string expression.

    First 15 hex digits of md5 (60 bits, always < 2^63). Spark's ``conv``
    and DuckDB's hex-literal cast agree exactly; used for minhash /
    fingerprint / bucketing operators that must oracle-match.
    """
    return f"CAST(CONCAT('0x', SUBSTRING(MD5({expr}), 1, 15)) AS BIGINT)"


def h64_spark(expr: str) -> str:
    """Spark flavor of :func:`h64` (DuckDB-only hex-cast syntax differs)."""
    return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"
