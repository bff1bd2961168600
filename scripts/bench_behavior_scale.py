"""Throughput of the event-behavior queries (benchqueries/behavior.py) on
a multi-million-row event stream.

sf0.1 events is only ~100k rows — small enough that these queries are
startup-bound. This builds 125 salted replicas (~12.5M events, user ids
disjoint per replica so group cardinality scales too: ~19k users) and
times each query shape end to end, which is where the one-shuffle /
keyed-window claims in the docstrings actually get tested.

Usage: python scripts/bench_behavior_scale.py
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from nyc_taxi_bigdata_pipeline_spark.benchqueries import behavior
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

REPLICAS = 125


def main() -> None:
    spark = get_spark("bench-behavior-scale")
    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    big = (
        ev.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "rep"))
        .select(
            (F.col("event_id") * REPLICAS + F.col("rep")).alias("event_id"),
            # shift each replica by rep minutes so timelines aren't clones
            (F.col("ts") + F.make_dt_interval(mins=F.col("rep"))).alias("ts"),
            (F.col("user_id") * REPLICAS + F.col("rep")).alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(32, "user_id")
        .persist()
    )
    n = big.count()
    users = big.select("user_id").distinct().count()
    print(f"stream: {n} events, {users} users", file=sys.stderr)
    big.createOrReplaceTempView("bq_funnel_events")
    big.createOrReplaceTempView("bq_ret_events")
    big.createOrReplaceTempView("bq_streak_events")
    big.createOrReplaceTempView("bq_ij_events")

    from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D

    def timed(label: str, sql: str) -> None:
        t0 = time.monotonic()
        out = spark.sql(sql).count()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.1f} s ({n / dt / 1e6:.1f}M events/s) -> {out} rows")

    timed("funnel (conditional-MIN per user)", behavior._funnel(D.SPARK, "bq_funnel_events"))
    timed("retention cohorts", behavior._retention(D.SPARK, "bq_ret_events"))
    timed("activity streaks (gaps-islands)", behavior._streaks(D.SPARK, "bq_streak_events"))
    timed("interval join (30-min band)", behavior._interval_join(D.SPARK, "bq_ij_events"))

    big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
