"""Scalar-function and subquery coverage (SURVEY §2.8 + Catalyst
decorrelation): string functions, correlated scalar subqueries, and the
TPC-H Q3 shipping-priority shape."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from ..functions import compat as C
from ..sources.tables import load_table, load_tables
from .registry import register, sx

# ------------------------------------------------------- string functions

_STR_SQL = """
SELECT upper(substring(p_brand, 1, 5)) AS brand_prefix,
       COUNT(*) AS cnt,
       CAST(SUM(length(p_name)) AS BIGINT) AS name_chars,
       MIN(concat(p_brand, '/', p_type)) AS min_key,
       MAX(lpad(CAST(p_size AS STRING), 3, '0')) AS max_size_key
FROM {table}
GROUP BY 1"""


@register(
    "string_functions",
    _STR_SQL.format(table="part"),
    doc="§2.8 string functions: upper/substring/concat/lpad/length over "
        "part attributes (the reference's only string op is a cast; the "
        "engine exposes the standard suite)",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "part").createOrReplaceTempView("bq_str_part")
    return spark.sql(_STR_SQL.format(table="bq_str_part"))


# --------------------------------------------- correlated scalar subquery

_NATION_AVG = (
    f"CAST(SUM({C.money('c2.c_acctbal')}) AS DOUBLE) / COUNT(c2.c_acctbal)"
)
_CORR_SQL = f"""
SELECT c_mktsegment AS segment, COUNT(*) AS cnt_above
FROM {{table}} c
WHERE c_acctbal > (
  SELECT {_NATION_AVG}
  FROM {{table}} c2 WHERE c2.c_nationkey = c.c_nationkey
)
GROUP BY c_mktsegment"""


@register(
    "correlated_subquery",
    _CORR_SQL.format(table="customer"),
    doc="§2.2 extension: correlated scalar subquery (customers above their "
        "nation's average balance) — Catalyst decorrelates to an aggregate "
        "+ join; the exact-decimal average keeps both engines identical",
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("bq_corr_customer")
    return spark.sql(_CORR_SQL.format(table="bq_corr_customer"))


# ------------------------------------------------------ TPC-H Q3 shape

_DISC = f"{C.money('l_extendedprice')} * (1 - {C.rate('l_discount')})"


@register(
    "shipping_priority",
    f"""SELECT l_orderkey, {C.sum_exact(_DISC, 'revenue')},
               CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    doc="TPC-H Q3 shape: selective dim filter + fact join + group +"
        " top-10 by aggregate (J4/A7/O2 composite)",
    bench=True,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        .join(
            t["orders"].filter(F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            broadcast(t["customer"].filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(sx(C.sum_exact(_DISC, "revenue")))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
