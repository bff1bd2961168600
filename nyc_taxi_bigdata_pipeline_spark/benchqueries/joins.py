"""Join queries (SURVEY §2.3): broadcast star joins, semi/anti, top-k.

The reference's joins are all fact→dim equi-joins over a star schema
(app.py:246-344, dw_load_incremental.sql). Here the dims are
region/nation (and customer), explicitly `broadcast()`-hinted — at 100 TB
the fact side never shuffles for a 25-row dim.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast

from ..functions import compat as C
from ..sources.tables import load_tables
from .registry import register, sx

_DISC = f"{C.money('l_extendedprice')} * (1 - {C.rate('l_discount')})"


@register(
    "region_revenue",
    f"""SELECT r_name, COUNT(*) AS cnt, {C.sum_exact(_DISC, 'revenue')}
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name""",
    doc="J1/J2/J4 chained fact→dim broadcast joins (app.py:246-344): revenue "
        "per region through the full star",
    bench=True,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(sx(C.count_star()), sx(C.sum_exact(_DISC, "revenue")))
    )


@register(
    "local_supplier_revenue",
    f"""SELECT n_name, {C.sum_exact(_DISC, 'revenue')}, COUNT(*) AS cnt
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        GROUP BY n_name""",
    doc="J4 multi-dim join + P9 date filter (TPC-H Q5 shape): customer and "
        "supplier in the same nation, revenue per nation in ASIA/1996",
    bench=True,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    return (
        t["lineitem"]
        .join(
            t["orders"].filter(
                F.to_date("o_orderdate").between("1996-01-01", "1996-12-31")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(sx(C.sum_exact(_DISC, "revenue")), sx(C.count_star()))
    )


@register(
    "semi_join_active",
    """SELECT c_mktsegment AS segment, COUNT(*) AS cnt FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       GROUP BY c_mktsegment""",
    doc="§2.3 semi join (EXISTS): customers with ≥1 order, per segment",
)
def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(sx(C.count_star()))
    )


@register(
    "anti_join_inactive",
    """SELECT n_name, COUNT(*) AS cnt FROM customer c
       JOIN nation ON c_nationkey = n_nationkey
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND CAST(o.o_orderdate AS DATE) >= DATE '1998-06-01')
       GROUP BY n_name""",
    doc="J6 idempotent-insert core: left-anti join against existing keys "
        "(dw_load_incremental.sql:54-94 ON CONFLICT DO NOTHING). The "
        "recency window makes the anti side NON-empty on the synthetic "
        "fixtures (every customer has *some* order, so the unconditional "
        "form was a vacuous 0-row parity check — r4 verdict finding #1)",
)
def anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "nation")
    recent = t["orders"].filter(F.to_date("o_orderdate") >= "1998-06-01")
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(sx(C.count_star()))
    )


@register(
    "topk_nation_segment",
    """SELECT n_name, c_mktsegment AS segment, COUNT(*) AS cnt
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name, c_mktsegment
       ORDER BY cnt DESC, n_name, segment LIMIT 10""",
    doc="A7/O2 two-key group-by + ORDER BY agg DESC LIMIT 10 "
        "(app.py:403-418 top zones); deterministic tiebreak on both keys",
)
def topk_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    return (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.col("c_mktsegment").alias("segment"))
        .agg(sx(C.count_star()))
        .orderBy(F.desc("cnt"), F.asc("n_name"), F.asc("segment"))
        .limit(10)
    )
