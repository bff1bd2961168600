"""Throughput of the round-2 late-addition operators at multi-million-row
scale (sf0.1 inputs are startup-bound for these shapes).

- CDC merge: 1.5M-row change feed applied onto a 150k-row base snapshot
- per-key exact-k sample: 1.5M orders across 5 strata
- decayed engagement: 12.5M events, ~19k users
- PageRank: nation trade graph built from 600k lineitems, then ranked
- token rarity: 125k docs (25× salted corpus)

Usage: python scripts/bench_newops_scale.py
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from nyc_taxi_bigdata_pipeline_spark.benchqueries import behavior, dialect as D
from nyc_taxi_bigdata_pipeline_spark.operators import graph, sampling, text, upsert
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def timed(label: str, fn, rows: int):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.1f} s ({rows / dt / 1e6:.2f}M rows/s) -> {out} rows")


def main() -> None:
    spark = get_spark("bench-newops-scale")

    # ---- CDC merge: 100 salted replicas of orders as the change feed,
    # 100× salted customers as the base (150k keys, 1.5M changes)
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    reps = spark.range(100).withColumnRenamed("id", "rep")
    base = (
        c.crossJoin(reps)
        .select(
            (F.col("c_custkey") * 100 + F.col("rep")).alias("k"),
            "c_mktsegment",
            F.col("c_acctbal").alias("bal"),
        )
        .persist()
    )
    feed = (
        o.crossJoin(reps)
        .select(
            (F.col("o_custkey") * 100 + F.col("rep")).alias("k"),
            (F.col("o_orderkey") * 100 + F.col("rep")).alias("seq"),
            F.when(F.col("o_orderkey") % 23 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("o_totalprice").alias("bal"),
        )
        .persist()
    )
    nb, nf = base.count(), feed.count()
    print(f"cdc: base {nb}, feed {nf}", file=sys.stderr)
    timed(
        f"cdc_merge ({nf // 1000}k changes onto {nb // 1000}k base)",
        lambda: upsert.apply_cdc(base, feed, "k", "seq", "op").count(),
        nf,
    )

    # ---- per-key exact-k over 100× orders (1.5M rows, 5 strata)
    big_o = (
        o.crossJoin(reps)
        .select("o_orderpriority", (F.col("o_orderkey") * 100 + F.col("rep")).alias("o_orderkey"))
        .persist()
    )
    no = big_o.count()
    timed(
        f"per_key_exact_sample k=1000 ({no // 1000}k rows, 5 strata)",
        lambda: sampling.per_key_exact_sample(
            big_o, "o_orderpriority", 1000, key_col="o_orderkey"
        ).count(),
        no,
    )

    # ---- decayed engagement at 12.5M events
    ev = load_table(spark, SF_DIR, "events")
    big_ev = (
        ev.crossJoin(spark.range(125).withColumnRenamed("id", "rep"))
        .select(
            (F.col("ts") + F.make_dt_interval(mins=F.col("rep"))).alias("ts"),
            (F.col("user_id") * 125 + F.col("rep")).alias("user_id"),
            "value",
        )
        .repartition(32, "user_id")
        .persist()
    )
    ne = big_ev.count()
    big_ev.createOrReplaceTempView("bq_decay_events")
    timed(
        f"user_decayed_engagement ({ne // 1_000_000}M events)",
        lambda: spark.sql(behavior._decayed_engagement(D.SPARK, "bq_decay_events")).count(),
        ne,
    )

    # ---- PageRank: trade graph from 600k lineitems (edge build dominates)
    li = load_table(spark, SF_DIR, "lineitem")
    s = load_table(spark, SF_DIR, "supplier")
    cust = load_table(spark, SF_DIR, "customer")
    nl = li.count()
    def _pagerank() -> int:
        edges = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(cust, o["o_custkey"] == cust["c_custkey"])
            .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
            .agg(F.count("*").alias("w"))
        )
        return graph.pagerank_fixed_point(edges, iterations=3).count()
    timed(f"pagerank_3iter (edges from {nl // 1000}k lineitems)", _pagerank, nl)

    # ---- token rarity at 125k docs
    docs = load_table(spark, SF_DIR, "documents")
    big_d = (
        docs.crossJoin(spark.range(25).withColumnRenamed("id", "rep"))
        .select((F.col("doc_id") * 25 + F.col("rep")).alias("doc_id"), "text")
        .repartition(32)
        .persist()
    )
    nd = big_d.count()
    timed(
        f"token_rarity_features ({nd // 1000}k docs)",
        lambda: text.token_rarity_features(big_d).count(),
        nd,
    )


if __name__ == "__main__":
    main()
