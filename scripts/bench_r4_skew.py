"""Round-4 skew stress: shuffle-heavy operators under a ZIPFIAN key
distribution (tail exponent s≈1.2, hot key ≈13% of all rows — the
"one celebrity user" shape every uniform/FK-salted probe so far missed).

Keys come from the inverse-CDF power law k = ⌊(1-u)^(-1/(s-1))⌋ with
u = deterministic xxhash64-uniform — P(K=k) ∝ k^-1.2, no RNG state.

Probes at 15M rows (plus smaller tiers where a probe's naive twin is
intentionally allowed to hit its cliff):

- apply_cdc: 15M-change feed, zipf-keyed, onto a 1M-key base — the
  struct-MAX fold partial-aggregates the hot key map-side, so the
  shuffle carries one row per key per task, not 2M hot rows.
- per_key_exact_sample: hot stratum of ~2M rows, k=10 — the hash-range
  pre-filter must cut the window input before the skewed sort.
- grouped_topk: row_number window over the zipf key — Spark 4's
  WindowGroupLimit pushes the rank-k cut below the exchange (partial
  top-k per map task), which is what makes the hot key survivable.
- keyed interval join (operators/asof.keyed_interval_join) vs the naive
  key-equi-join + band residual: the naive form's intermediate output
  is QUADRATIC in the hot key's rows (no AQE skew split can shrink join
  output) — it is timed only at the two small tiers to expose the
  superlinear step; the bucketed form runs all tiers linearly.

Usage: python scripts/bench_r4_skew.py [--rows 15000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.asof import keyed_interval_join
from nyc_taxi_bigdata_pipeline_spark.operators.sampling import per_key_exact_sample
from nyc_taxi_bigdata_pipeline_spark.operators.topk import grouped_topk
from nyc_taxi_bigdata_pipeline_spark.operators.upsert import apply_cdc
from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan
from nyc_taxi_bigdata_pipeline_spark.session import get_spark


def zipf_frame(spark, rows: int):
    """(id, k zipf-keyed, ts_us over 30 days, v) — deterministic."""
    u = (F.pmod(F.xxhash64("id"), F.lit(1 << 30)) + 0.5) / F.lit(float(1 << 30))
    k = F.least(
        F.floor(F.pow(1.0 - u, F.lit(-5.0))).cast("long"), F.lit(1_000_000)
    )
    span_us = 30 * 24 * 3600 * 1_000_000
    return (
        spark.range(rows)
        .withColumn("k", k)
        .withColumn("ts_us", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(span_us)))
        .withColumn("v", (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0))
    )


def timed(label: str, fn) -> float:
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.1f} s -> {out}")
    sys.stdout.flush()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=15_000_000)
    args = ap.parse_args()
    spark = get_spark("bench-r4-skew")

    df = zipf_frame(spark, args.rows).localCheckpoint(eager=True)
    hot = df.groupBy("k").count().orderBy(F.desc("count")).first()
    print(f"rows={args.rows} hot key {hot['k']} holds {hot['count']} rows "
          f"({100.0 * hot['count'] / args.rows:.1f}%)")

    # --- apply_cdc: zipf change feed onto a 1M-key base
    base = (
        spark.range(1_000_000)
        .select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
        .localCheckpoint(eager=True)
    )
    changes = df.select(
        "k",
        F.col("id").alias("seq"),
        F.when(F.col("id") % 97 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        "v",
    )
    timed("apply_cdc (15M zipf changes)", lambda: apply_cdc(base, changes, "k").count())

    # --- per-key exact sample: hot stratum ~13% of rows
    timed(
        "per_key_exact_sample k=10",
        lambda: per_key_exact_sample(df, "k", 10, key_col="id").count(),
    )

    # --- grouped top-k over the zipf key
    tk = grouped_topk(df, ["k"], [F.col("v").desc(), F.col("id")], 5)
    plan = physical_plan(tk)
    print("grouped_topk WindowGroupLimit in plan:", "WindowGroupLimit" in plan)
    timed("grouped_topk k=5", tk.count)

    # --- interval join: views within 30 min before each purchase
    lookback_us = 30 * 60 * 1_000_000

    def split(frame):
        p = frame.filter(F.col("id") % 10 == 0).select("k", F.col("ts_us").alias("p_ts"))
        v = frame.filter(F.col("id") % 10 != 0).select("k", F.col("ts_us").alias("v_ts"))
        return p, v

    for tier in (args.rows // 100, args.rows // 10):
        sub = zipf_frame(spark, tier).localCheckpoint(eager=True)
        p, v = split(sub)
        vn = v.withColumnRenamed("k", "vk")
        naive = p.join(
            vn,
            (p["k"] == vn["vk"])
            & (vn["v_ts"] >= p["p_ts"] - F.lit(lookback_us))
            & (vn["v_ts"] <= p["p_ts"]),
        )
        timed(f"interval naive @ {tier} rows", naive.count)
        sub.unpersist()

    for tier in (args.rows // 100, args.rows // 10, args.rows):
        sub = df if tier == args.rows else zipf_frame(spark, tier).localCheckpoint(eager=True)
        p, v = split(sub)
        timed(
            f"interval bucketed @ {tier} rows",
            keyed_interval_join(p, v, "k", "p_ts", "v_ts", lookback_us).count,
        )
        if sub is not df:
            sub.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
