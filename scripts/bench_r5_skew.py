"""Round-5 skew stress: the two remaining per-key WINDOW operators —
SCD2 merge and gap sessionization — under the same zipfian key
distribution as scripts/bench_r4_skew.py (s≈1.2, hot key ≈13% of rows).

Both are window shapes, so unlike the interval join there is no
candidate-generation trick to sidestep the hot key: the question the
probe answers is whether the plan keeps the hot key's cost at
O(hot · log hot) (one partition sorts ~2M rows — a straggler, not a
cliff) and whether everything AROUND the window stays partial-agg /
broadcast so the straggler is the only cost.

- scd2_apply: 15M zipf-keyed attribute updates onto a 1M-key SCD2
  table. The windows partition by (key) over the UPDATE batch only;
  history rows bypass. Watch: dedupe-vs-current join must not copy the
  base per update row.
- sessionization: LAG + running-SUM windows per user over the zipf key,
  then the per-session aggregate. The hot user's whole history lands in
  one task by construction (correctness requires it); linearity across
  row tiers is the pass bar.

Usage: python scripts/bench_r5_skew.py [--rows 15000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.scd import scd2_apply, scd2_init
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed, zipf_frame


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=15_000_000)
    args = ap.parse_args()
    spark = get_spark("bench-r5-skew")

    for tier in (args.rows // 100, args.rows // 10, args.rows):
        df = zipf_frame(spark, tier).localCheckpoint(eager=True)
        hot = df.groupBy("k").count().orderBy(F.desc("count")).first()
        print(f"tier={tier} hot key {hot['k']} holds {hot['count']} rows "
              f"({100.0 * hot['count'] / tier:.1f}%)")

        # --- SCD2: zipf update batch onto a 1M-key dim
        dim = spark.range(1_000_000).select(
            F.col("id").alias("k"), F.lit("seg0").alias("seg")
        )
        scd = scd2_init(dim, "k", ["seg"], "2020-01-01").localCheckpoint(eager=True)
        updates = df.select(
            "k",
            F.concat(F.lit("seg"), (F.col("v") * 100).cast("int")).alias("seg"),
            F.date_add(F.lit("2021-01-01").cast("date"),
                       (F.col("ts_us") / F.lit(86_400_000_000)).cast("int"))
            .alias("eff_date"),
        )
        timed(
            f"scd2_apply @ {tier} zipf updates",
            lambda: scd2_apply(scd, updates, "k", ["seg"]).count(),
        )

        # --- sessionization: LAG + running SUM per zipf key
        ev = df.select(
            F.col("k").alias("user_id"), F.col("id").alias("event_id"),
            F.col("ts_us").alias("t"), "v",
        )
        ev.createOrReplaceTempView("r5_skew_events")
        sess = spark.sql("""
            WITH flagged AS (
              SELECT user_id, t, v,
                     CASE WHEN t - LAG(t) OVER (PARTITION BY user_id
                                                ORDER BY t, event_id)
                               > 1800000000
                          OR LAG(t) OVER (PARTITION BY user_id
                                          ORDER BY t, event_id) IS NULL
                          THEN 1 ELSE 0 END AS new_session,
                     event_id
              FROM r5_skew_events
            ),
            sess AS (
              SELECT user_id, t, v,
                     SUM(new_session) OVER (PARTITION BY user_id
                                            ORDER BY t, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS session_id
              FROM flagged
            )
            SELECT user_id, session_id, MIN(t) AS start_us, MAX(t) AS end_us,
                   COUNT(*) AS n_events, SUM(v) AS total_value
            FROM sess GROUP BY user_id, session_id
        """)
        timed(f"sessionize @ {tier} zipf rows", sess.count)
        df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
