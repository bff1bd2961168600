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
