"""Per-phase profile of the shipped robust_zscore_mad path at 100M,
plus a same-box re-time of the OLD rank-window SQL shape (the r7
probe's 199.6 s was a different-speed host — CLAUDE.md drift rule).

Usage: python scripts/bench_r9_quantiles_profile.py [--rows N]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries.stats_ops import (
    _MAD_SQL,
    mad_profile,
)
from nyc_taxi_bigdata_pipeline_spark.operators.quantiles import (
    grouped_quantile_select,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed
from scripts.bench_r7_newops import synth_events


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument(
        "--no-phases",
        action="store_true",
        help="time only old-shape vs shipped end-to-end (big tiers)",
    )
    args = ap.parse_args()
    spark = get_spark("bench-r9-qprof")
    n = args.rows

    ev = synth_events(spark, n).localCheckpoint(eager=True)

    # ---- old one-shot rank-window shape, same box, same frame
    ev.createOrReplaceTempView("probe_events")
    timed(
        f"OLD rank-window _MAD_SQL @ {n}",
        lambda: tuple(spark.sql(_MAD_SQL.format(table="probe_events")).collect()[0]),
    )

    # ---- shipped path end-to-end
    timed(f"shipped mad_profile @ {n}", lambda: len(mad_profile(ev).collect()))
    if args.no_phases:
        return

    # ---- phase breakdown of the shipped path
    v = (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", F.col("value").alias("x"))
        .localCheckpoint(eager=False)
    )
    timed("  phase: materialize v (lazy checkpoint forced)", lambda: v.count())
    med = grouped_quantile_select(v, ["event_type"], "x", [0.5]).select(
        "event_type", "n", F.col("qvalue").alias("med")
    )
    timed("  phase: median via grouped_quantile_select", lambda: med.collect())
    d = (
        v.join(F.broadcast(med), "event_type")
        .select(
            "event_type", "n", "med",
            F.abs(F.col("x") - F.col("med")).alias("dev"),
        )
        .localCheckpoint(eager=False)
    )
    timed("  phase: materialize d (dev projection)", lambda: d.count())
    mad = grouped_quantile_select(
        d.select("event_type", "dev"), ["event_type"], "dev", [0.5]
    ).select("event_type", F.col("qvalue").alias("mad"))
    timed("  phase: MAD via grouped_quantile_select", lambda: mad.collect())
    out = (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum(
                F.when(
                    F.lit(0.6745) * F.col("dev") > F.lit(3.5) * F.col("mad"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
    )
    timed("  phase: final outlier groupBy", lambda: out.collect())


if __name__ == "__main__":
    main()
