"""Closed-form grouped statistics: OLS linear fit and Pearson
correlation from exact decimal moments — the aggregate-only regression
form a 100-TB fit actually uses (ONE partial-aggregable pass collects
(n, Σx, Σy, Σxy, Σx², Σy²) per group; no iterative solver, no second
scan). The moment sums are exact DECIMAL (the functions/compat.py
discipline), surfaced as DOUBLE only inside a textually-shared final
expression.

One extra hazard beyond the compat docstring: `a*b - c*d` double
expressions can FMA-CONTRACT in DuckDB's native build (fused multiply-
add keeps the intermediate product unrounded) while the JVM never
fuses — measured as a last-ulp pearson_r divergence at sf0.001. The
final slope/intercept/r therefore snap to a 1e-9 fixed-point grid
(FLOOR(x*1e9 + 0.5)/1e9, shared text) before leaving the query; the
ulp-scale FMA difference is ~1e-17, eight orders below the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import compat as C
from ..sources.tables import load_table
from .registry import register

# exact decimal moments for y = extendedprice (money) on x = quantity
_MOMS = f"""
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({C.money('l_quantity')}) AS DOUBLE) AS sx,
         CAST(SUM({C.money('l_extendedprice')}) AS DOUBLE) AS sy,
         CAST(SUM({C.money('l_quantity')} * {C.money('l_extendedprice')}) AS DOUBLE) AS sxy,
         CAST(SUM({C.money('l_quantity')} * {C.money('l_quantity')}) AS DOUBLE) AS sxx,
         CAST(SUM({C.money('l_extendedprice')} * {C.money('l_extendedprice')}) AS DOUBLE) AS syy
  FROM {{table}} GROUP BY l_returnflag"""

def _snap9(expr: str, alias: str) -> str:
    """Fixed-point snap: kills FMA-contraction last-ulp divergence.
    Divisor is CAST AS DOUBLE — a bare N.0 literal is DECIMAL in Spark
    SQL and BIGINT/DECIMAL division truncates scale (working notes)."""
    return (
        f"CAST(FLOOR(({expr}) * 1000000000.0 + 0.5) AS BIGINT)"
        f" / CAST(1000000000 AS DOUBLE) AS {alias}"
    )


_SLOPE = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"

_LINFIT_SQL = f"""
WITH m AS ({_MOMS})
SELECT l_returnflag, n,
       {_snap9(_SLOPE, 'slope')},
       {_snap9(f'(sy - ({_SLOPE}) * sx) / n', 'intercept')}
FROM m ORDER BY l_returnflag"""


@register(
    "grouped_linear_fit",
    _LINFIT_SQL.format(table="lineitem"),
    doc="analytics ext: per-group closed-form OLS (extendedprice ~ "
        "quantity by returnflag) from exact decimal moments — one "
        "partial-aggregable scan collects (n, Σx, Σy, Σxy, Σx²); slope/"
        "intercept are a textually-shared double expression over exact "
        "sums, so the oracle hash-matches despite the float outputs",
)
def grouped_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "bq_linfit_lineitem"
    )
    return spark.sql(_LINFIT_SQL.format(table="bq_linfit_lineitem"))


_CORR_SQL = f"""
WITH m AS ({_MOMS})
SELECT l_returnflag, n,
       {_snap9('(n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))', 'pearson_r')}
FROM m ORDER BY l_returnflag"""


@register(
    "grouped_correlation",
    _CORR_SQL.format(table="lineitem"),
    doc="analytics ext: per-group Pearson correlation (quantity vs "
        "extendedprice by returnflag) from the same exact-decimal "
        "moment pass as grouped_linear_fit — corr() built-ins differ "
        "across engines in accumulation order, the moment form doesn't",
)
def grouped_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "bq_corr_lineitem"
    )
    return spark.sql(_CORR_SQL.format(table="bq_corr_lineitem"))


# Robust per-group outlier profile: median + MAD + modified-z-score
# counts (Iglewicz–Hoaglin: |0.6745·(x−med)/MAD| > 3.5) — the outlier
# rule a mean/stddev z-score can't provide when the outliers themselves
# inflate the stddev (anomaly_zscore's known blind spot). Medians use
# the same rank-interpolation idiom as grouped_percentiles; the
# interpolation fraction is structurally 0.0 or 0.5 (exact in binary),
# so the multiply-add can't FMA-diverge. Constants go through CAST(..AS
# DOUBLE) — bare decimal literals are DECIMAL in Spark SQL.
_MAD_SQL = """
WITH v AS (
  SELECT event_type, value AS x FROM {table} WHERE value IS NOT NULL
),
o AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
g AS (SELECT DISTINCT event_type, n FROM o),
med AS (
  SELECT g.event_type, g.n,
         CAST(lov.x + (hiv.x - lov.x)
              * ((1.0 + (g.n - 1) * 0.5) - FLOOR(1.0 + (g.n - 1) * 0.5))
              AS DOUBLE) AS med
  FROM g
  JOIN o lov ON lov.event_type = g.event_type
            AND lov.rn = CAST(FLOOR(1.0 + (g.n - 1) * 0.5) AS BIGINT)
  JOIN o hiv ON hiv.event_type = g.event_type
            AND hiv.rn = CAST(CEILING(1.0 + (g.n - 1) * 0.5) AS BIGINT)
),
d AS (
  SELECT v.event_type, v.x, m.med, ABS(v.x - m.med) AS dev
  FROM v JOIN med m ON m.event_type = v.event_type
),
od AS (
  SELECT event_type, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT g.event_type,
         CAST(lov.dev + (hiv.dev - lov.dev)
              * ((1.0 + (g.n - 1) * 0.5) - FLOOR(1.0 + (g.n - 1) * 0.5))
              AS DOUBLE) AS mad
  FROM (SELECT DISTINCT event_type, n FROM od) g
  JOIN od lov ON lov.event_type = g.event_type
             AND lov.rn = CAST(FLOOR(1.0 + (g.n - 1) * 0.5) AS BIGINT)
  JOIN od hiv ON hiv.event_type = g.event_type
             AND hiv.rn = CAST(CEILING(1.0 + (g.n - 1) * 0.5) AS BIGINT)
)
SELECT d.event_type, MAX(m.n) AS n,
       MAX(d.med) AS median_value, MAX(a.mad) AS mad,
       CAST(SUM(CASE WHEN CAST(0.6745 AS DOUBLE) * d.dev
                          > CAST(3.5 AS DOUBLE) * a.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d
JOIN mad a ON a.event_type = d.event_type
JOIN med m ON m.event_type = d.event_type
GROUP BY d.event_type
ORDER BY d.event_type"""


@register(
    "robust_zscore_mad",
    _MAD_SQL.format(table="events"),
    doc="analytics ext: per-group robust outlier profile — exact "
        "interpolated median, MAD, and modified-z-score (Iglewicz–"
        "Hoaglin 0.6745·dev/MAD > 3.5) outlier counts per event type. "
        "Rank windows partition by group (each group sorts "
        "independently, no global window); two passes over values plus "
        "a broadcast-sized (group, median/mad) join back. The scale "
        "path for the median itself is the bucketed two-pass selection "
        "(percentiles) or hdr_quantile_sketch; this is the exact "
        "oracle-checkable form",
)
def robust_zscore_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("bq_mad_events")
    return spark.sql(_MAD_SQL.format(table="bq_mad_events"))
