"""TPC-H composite shapes the SQL surface didn't pin yet (§2.2–§2.6
extensions): conditional-aggregate ratios (Q14), aggregate-vs-global-max
selection (Q15), HAVING over a grouped sum feeding a join (Q18), scalar
subquery + anti join (Q22), and HAVING against a scalar fraction-of-total
subquery (Q11).

The reference's analytical layer stops at star-join group-bys
(ex04_dashboard/streamlit_app/app.py:239-418); these queries pin the
next ring of relational capability a user migrating a SQL workload
expects — each one a different composition of operators the engine
already supports individually. All money arithmetic follows the
exact-decimal discipline from functions/compat.py so every query
hash-matches DuckDB bit-for-bit.

Scale notes (100 TB): part/supplier joins broadcast the dim side; the
grouped HAVING shapes are one map-side-combined hash aggregate plus a
selective join; the scalar subqueries are 1-row broadcasts, never
driver collects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from ..functions import compat as C
from ..sources.tables import load_table, load_tables
from .registry import register, sx

_DISC = f"{C.money('l_extendedprice')} * (1 - {C.rate('l_discount')})"
# zero literal with the SAME decimal type as _DISC in both engines, so the
# CASE branches never widen differently
_DISC_ZERO = f"{C.money('0')} * (1 - {C.rate('0')})"


# ------------------------------------------------------------- Q14 shape

_PROMO_ORACLE = f"""
SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS yr,
       {C.sum_exact(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC} ELSE {_DISC_ZERO} END",
                    'promo_revenue')},
       {C.sum_exact(_DISC, 'total_revenue')},
       ROUND(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC} ELSE {_DISC_ZERO} END) AS DOUBLE)
             * CAST(100 AS DOUBLE)
             / CAST(SUM({_DISC}) AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1"""


@register(
    "promo_revenue",
    _PROMO_ORACLE,
    doc="TPC-H Q14 shape: conditional-aggregate ratio — promo revenue share "
        "per ship year through a fact→part broadcast join; both sums are "
        "exact-decimal, the ratio is one identical double division",
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    promo = f"CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC} ELSE {_DISC_ZERO} END"
    return (
        t["lineitem"]
        .join(broadcast(t["part"].select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year(F.to_date("l_shipdate")).alias("yr"))
        .agg(
            sx(C.sum_exact(promo, "promo_revenue")),
            sx(C.sum_exact(_DISC, "total_revenue")),
            sx(f"ROUND(CAST(SUM({promo}) AS DOUBLE) * CAST(100 AS DOUBLE)"
               f" / CAST(SUM({_DISC}) AS DOUBLE), 6) AS promo_pct"),
        )
    )


# ------------------------------------------------------------- Q15 shape

_TOP_SUPPLIER_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {C.sum_exact(_DISC, 'total_rev')}
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)"""


@register(
    "top_supplier",
    _TOP_SUPPLIER_ORACLE,
    doc="TPC-H Q15 shape: grouped revenue view + selection against its own "
        "global MAX (scalar subquery over an aggregate); ties all surface, "
        "so the result is deterministic without a tiebreak. The 1-row max "
        "is a broadcast, the per-supplier rollup is one hash aggregate",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(F.to_date("l_shipdate").between("1996-01-01", "1996-03-31"))
        .groupBy("l_suppkey")
        .agg(sx(C.sum_exact(_DISC, "total_rev")))
        # rev feeds both the MAX anchor and the final join — materialize
        # the supplier-count-sized aggregate once or lineitem scans twice
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


# ------------------------------------------------------------- Q18 shape

_BIG_ORDERS_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS {C.MONEY})) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS {C.MONEY})) > 250)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_totalprice AS totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey"""


@register(
    "big_order_customers",
    _BIG_ORDERS_ORACLE,
    doc="TPC-H Q18 shape: HAVING over a grouped decimal sum (orders whose "
        "line quantity exceeds 250) feeding a join back to orders and "
        "customer — the aggregate prunes ~99% of orderkeys before any "
        "wide-row join happens, so the expensive joins see only survivors",
    bench=True,
)
def big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    qty = f"CAST(l_quantity AS {C.MONEY})"
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.expr(f"SUM({qty})").alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.expr("CAST(qty_dec AS DOUBLE)").alias("total_qty"))
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


# ------------------------------------------------------------- Q22 shape

_SALES_OPP_ORACLE = f"""
SELECT CAST(c_custkey % 25 AS INT) AS cc, COUNT(*) AS cnt,
       {C.sum_exact(C.money('c_acctbal'), 'total_bal')}
FROM customer c
WHERE c_acctbal > (
        SELECT CAST(SUM({C.money('c_acctbal')}) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
GROUP BY 1"""


@register(
    "sales_opportunity",
    _SALES_OPP_ORACLE,
    doc="TPC-H Q22 shape: uncorrelated scalar subquery (exact-decimal "
        "average positive balance) gating an anti join (above-average-"
        "balance customers who never placed a >$300k order), grouped by a "
        "derived country code (custkey mod 25 — the synthetic schema has "
        "no phone column). The scalar is a 1-row broadcast; the anti join "
        "pre-filters the order side before shuffling on the customer key",
)
def sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.expr(
            f"CAST(SUM({C.money('c_acctbal')}) AS DOUBLE) / COUNT(*)"
        ).alias("avg_bal"))
    )
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_totalprice") > 300000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy(F.expr("CAST(c_custkey % 25 AS INT)").alias("cc"))
        .agg(sx(C.count_star()), sx(C.sum_exact(C.money("c_acctbal"), "total_bal")))
    )


# ------------------------------------------------------------- Q11 shape

_BRAND_SHARE_ORACLE = f"""
WITH br AS (
  SELECT p_brand, SUM({_DISC}) AS rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand),
tot AS (SELECT SUM(rev_dec) AS t FROM br)
SELECT p_brand, CAST(rev_dec AS DOUBLE) AS revenue,
       ROUND(CAST(rev_dec AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
FROM br, tot
WHERE CAST(rev_dec AS DOUBLE)
      > CAST(t AS DOUBLE) * CAST(4 AS DOUBLE) / CAST(100 AS DOUBLE)"""


@register(
    "brand_revenue_share",
    _BRAND_SHARE_ORACLE,
    doc="TPC-H Q11 shape: groups kept only when their aggregate exceeds a "
        "fraction of the grand total (scalar subquery over the same "
        "aggregate) — brands above a 4% revenue share. Two passes over the "
        "small grouped result, one pass over the fact; the total is a "
        "1-row broadcast. Division happens once on identical doubles",
)
def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    br = (
        t["lineitem"]
        .join(broadcast(t["part"].select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.expr(f"SUM({_DISC})").alias("rev_dec"))
        # br feeds both the grand-total anchor and the share filter —
        # materialize the ~25-brand aggregate once or lineitem scans twice
        .localCheckpoint(eager=False)
    )
    tot = br.agg(F.sum("rev_dec").alias("t"))
    return (
        br.join(broadcast(tot))
        .filter(F.expr(
            "CAST(rev_dec AS DOUBLE)"
            " > CAST(t AS DOUBLE) * CAST(4 AS DOUBLE) / CAST(100 AS DOUBLE)"))
        .select(
            "p_brand",
            F.expr("CAST(rev_dec AS DOUBLE)").alias("revenue"),
            F.expr("ROUND(CAST(rev_dec AS DOUBLE) / CAST(t AS DOUBLE), 6)").alias("share"),
        )
    )


# ------------------------------------------- date-spine gap fill (A3 ext)

_GAPFILL_ORACLE = f"""
WITH spine AS (
  SELECT CAST(d AS DATE) AS day
  FROM generate_series(DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY) t(d)),
cnts AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c,
         {C.sum_exact(C.fine('o_totalprice'), 'r')}
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
  GROUP BY 1)
SELECT s.day, CAST(COALESCE(c, 0) AS BIGINT) AS cnt,
       COALESCE(r, CAST(0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN cnts USING (day)"""


@register(
    "daily_series_gapfill",
    _GAPFILL_ORACLE,
    doc="A3 extension: zero-filled daily series over a generated date spine "
        "(sequence+explode) — the time-series idiom the reference's daily "
        "chart silently gets wrong on empty days (app.py:287-300 skips "
        "them). The fact side aggregates to one row per day BEFORE the "
        "join and broadcasts (the build side of a left-outer join must "
        "be the right side)",
)
def daily_series_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cnts = (
        o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & F.to_date("o_orderdate").between("1995-01-01", "1995-03-31")
        )
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(sx(C.count_star("c")), sx(C.sum_exact(C.fine("o_totalprice"), "r")))
    )
    spine = spark.sql(
        "SELECT explode(sequence(DATE '1995-01-01', DATE '1995-03-31',"
        " INTERVAL 1 DAY)) AS day"
    )
    return (
        spine
        .join(broadcast(cnts), "day", "left")
        .select(
            "day",
            F.expr("CAST(COALESCE(c, 0) AS BIGINT)").alias("cnt"),
            F.expr("COALESCE(r, CAST(0 AS DOUBLE))").alias("revenue"),
        )
    )


# ------------------------------------------------------------- Q12 shape


def _ship_delay_sql(engine: str) -> str:
    """Order→ship delay in whole days via epoch-day indices (DATE-cast
    based, so TIMESTAMP_NTZ parquet columns work — unix_micros rejects
    them), bucketed, with Q12's priority-class conditional counts inside
    each bucket."""
    from . import dialect as D

    d_ship = D.epoch_day("l_shipdate", engine)
    d_ord = D.epoch_day("o_orderdate", engine)
    return f"""
    WITH delays AS (
      SELECT ({d_ship}) - ({d_ord}) AS delay_days, o_orderpriority
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT CASE WHEN delay_days < 30 THEN 'lt_30d'
                WHEN delay_days < 60 THEN 'lt_60d'
                WHEN delay_days < 90 THEN 'lt_90d'
                ELSE 'ge_90d' END AS delay_bucket,
           COUNT(*) AS line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           CAST(MIN(delay_days) AS BIGINT) AS min_delay,
           CAST(MAX(delay_days) AS BIGINT) AS max_delay
    FROM delays GROUP BY 1"""


@register(
    "shipping_delay_profile",
    _ship_delay_sql("duck"),
    doc="TPC-H Q12 shape: order→ship delay distribution — integer-day "
        "delay from epoch-µs day indices (drift-proof across parquet "
        "timestamp precisions), CASE-bucketed, with urgent/high vs other "
        "priority conditional counts per bucket. One fact join + one "
        "map-side-combined hash aggregate; all-integer arithmetic",
)
def shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_tables as _lt

    t = _lt(spark, sf_dir, "lineitem", "orders")
    t["lineitem"].createOrReplaceTempView("bq_q12_lineitem")
    t["orders"].createOrReplaceTempView("bq_q12_orders")
    sql = _ship_delay_sql("spark").replace(
        "FROM lineitem JOIN orders", "FROM bq_q12_lineitem JOIN bq_q12_orders"
    )
    return spark.sql(sql)
