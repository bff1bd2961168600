"""Reshaping operators: pivot, array explode with ordinality, moving
averages. Stock Spark capabilities surfaced by the analytical layer
(absent from the reference's SQL, cheap per SURVEY §2.4's note)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from . import dialect as D
from .registry import register

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]

_PIVOT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       {', '.join(f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS {a}"
                   for p, a in zip(_PRIORITIES, _PIV_ALIASES))}
FROM orders GROUP BY 1"""


@register(
    "pivot_priority_by_year",
    _PIVOT_ORACLE,
    doc="§2.4 extension: pivot (long→wide) via Spark's native "
        "groupBy().pivot() with an explicit value list (one pass, no "
        "distinct-discovery job); oracle is the equivalent CASE matrix",
)
def pivot_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    return piv.select(
        "yr",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
            for p, a in zip(_PRIORITIES, _PIV_ALIASES)
        ],
    )


def _explode_stats(engine: str, table: str) -> str:
    if engine == D.DUCK:
        src = (
            f"SELECT p.pos AS pos, e.embedding[p.pos] AS val "
            f"FROM {table} e CROSS JOIN generate_series(1, 64) p(pos)"
        )
    else:
        # posexplode is 0-based; +1 aligns with DuckDB's 1-based indexing
        src = f"SELECT pos + 1 AS pos, val FROM (SELECT posexplode(embedding) AS (pos, val) FROM {table})"
    return f"""
    SELECT CAST(pos AS INT) AS pos, COUNT(val) AS cnt,
           MIN(val) AS min_val, MAX(val) AS max_val
    FROM ({src}) x GROUP BY pos"""


@register(
    "explode_embedding_stats",
    _explode_stats(D.DUCK, "embeddings"),
    doc="§2.8 extension: array explode with ordinality → per-dimension "
        "min/max profile of the embedding corpus (floats compared, never "
        "summed — float accumulation would be order-dependent)",
)
def explode_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("bq_expl_emb")
    return spark.sql(_explode_stats(D.SPARK, "bq_expl_emb"))


_MOVAVG_SQL = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c
  FROM {table} GROUP BY 1
)
SELECT day, c,
       CAST(SUM(c) OVER w AS DOUBLE) / COUNT(c) OVER w AS ma7
FROM d
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""


@register(
    "moving_average_daily",
    _MOVAVG_SQL.format(table="orders"),
    doc="§2.5 extension: 7-day moving average over the daily series "
        "(A3) — explicit SUM/COUNT window division so both engines do "
        "the identical exact-int → double arithmetic",
)
def moving_average_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bq_ma_orders")
    return spark.sql(_MOVAVG_SQL.format(table="bq_ma_orders"))


# ---------------------------------------------------- snapshot diffing

_DIFF_ORACLE = """
WITH old_snap AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE CAST(o_orderdate AS DATE) < DATE '1997-07-01'
),
new_snap AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 50 = 0
              THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    AND o_orderkey % 97 <> 0
),
diff AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_orderstatus <> n.o_orderstatus
                OR o.o_totalprice <> n.o_totalprice THEN 'changed'
              ELSE 'unchanged' END AS diff_status
  FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
)
SELECT diff_status, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key
FROM diff GROUP BY diff_status ORDER BY diff_status"""


@register(
    "dataset_snapshot_diff",
    _DIFF_ORACLE,
    doc="warehouse ext: row-level snapshot diff (operators/upsert."
        "snapshot_diff) -- two simulated versions of orders (a later "
        "date horizon, a deleted key slice, a mutated price slice) "
        "full-outer-joined into added/removed/changed/unchanged "
        "counts. The operator folds compare columns to one xxhash64 "
        "per side BEFORE the join, so the shuffle carries key + 8 "
        "bytes regardless of row width; the oracle compares columns "
        "directly (same classes -- hashing changes no verdict)",
)
def dataset_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(
        F.to_date("o_orderdate") < "1997-07-01"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    new = (
        orders.filter(
            (F.to_date("o_orderdate") < "1998-01-01")
            & (F.col("o_orderkey") % 97 != 0)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(F.col("o_orderkey") % 50 == 0, F.col("o_totalprice") + 1)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    d = snapshot_diff(old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"])
    return (
        d.groupBy("diff_status")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("diff_status")
    )
