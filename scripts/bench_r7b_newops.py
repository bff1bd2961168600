"""Scale probes for the second batch of r7 additions.

- `ab_test_welch` / `anova_oneway` SQL shapes over synthetic events:
  both are ONE map-side-combinable hash aggregate over (event_type) with
  conditional moment columns — pass bar: ~linear seconds, flat small
  tiers (overhead-dominated).
- `dataset_negative_sample` shape over a synthetic corpus: constant 4×
  explode → one shuffle equi-join on the hash-ring candidate id → counts.
  Pass bar: ~linear.
- `dataset_mixture_resample` shape (shipped checkpointed-counts flavor):
  two corpus passes + broadcast-sized source table. Pass bar: ~linear.

All corpora are xxhash64-deterministic and repartitioned to 32 (a
single-range frame is otherwise ONE partition — working-notes pitfall).

Usage: python scripts/bench_r7b_newops.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.benchqueries.dataset_ops import (
    _MIX_COUNTS,
    _mixture_read_sql,
    _negative_sample_sql,
)
from nyc_taxi_bigdata_pipeline_spark.benchqueries.stats_ops import (
    _ANOVA_SQL,
    _WELCH_SQL,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def synth_events(spark, n: int, types: int = 5):
    """Deterministic events with user ids and 2-decimal money values
    (the Welch/ANOVA queries cast value through DECIMAL(12,2))."""
    return (
        spark.range(n)
        .select(
            F.expr(f"concat('t', pmod(xxhash64(id, 2), {types}))").alias(
                "event_type"
            ),
            F.expr("pmod(xxhash64(id, 5), 1000000)").alias("user_id"),
            F.expr(
                "CAST(pmod(xxhash64(id, 3), 10000) AS DOUBLE) / 100.0"
            ).alias("value"),
        )
        .repartition(32)
    )


def synth_docs(spark, n: int, sources: int = 20):
    """Contiguous-id corpus with a source label — the only columns the
    negative-sample and mixture-resample shapes touch."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(f"concat('s', pmod(xxhash64(id, 7), {sources}))").alias(
                "source"
            ),
        )
        .repartition(32)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 100x tiers")
    args = ap.parse_args()
    spark = get_spark("bench-r7b-newops")

    # NOTE: every probe COLLECTS and folds the output into a checksum —
    # a bare .count() lets Catalyst prune the expensive columns (count
    # of a groupBy needs only the grouping keys, and a LEFT JOIN against
    # an aggregate with provably-unique keys is eliminated outright), so
    # a count-timed "probe" can measure a plan that skipped the work.
    ev_tiers = [1_000_000, 10_000_000] + ([100_000_000] if args.full else [])
    for n in ev_tiers:
        ev = synth_events(spark, n).localCheckpoint(eager=True)
        ev.createOrReplaceTempView("probe_events")
        timed(
            f"ab_test_welch shape @ {n} events",
            lambda: sum(
                r.t_stat
                for r in spark.sql(
                    _WELCH_SQL.format(table="probe_events")
                ).collect()
            ),
        )
        timed(
            f"anova_oneway shape @ {n} events",
            lambda: spark.sql(_ANOVA_SQL.format(table="probe_events"))
            .collect()[0]
            .f_stat,
        )
        ev.unpersist()

    doc_tiers = [1_000_000, 10_000_000] + ([100_000_000] if args.full else [])
    for n in doc_tiers:
        docs = synth_docs(spark, n).localCheckpoint(eager=True)
        docs.createOrReplaceTempView("probe_docs")
        timed(
            f"dataset_negative_sample shape @ {n} docs",
            lambda: sum(
                r.n_valid
                for r in spark.sql(
                    _negative_sample_sql(D.SPARK, "probe_docs")
                ).collect()
            ),
        )

        def _mixture():
            counts = spark.sql(
                _MIX_COUNTS.format(table="probe_docs")
            ).localCheckpoint(eager=False)
            counts.createOrReplaceTempView("probe_mix_counts")
            return sum(
                r.n_kept
                for r in spark.sql(
                    _mixture_read_sql(D.SPARK, "probe_docs", "probe_mix_counts")
                ).collect()
            )

        timed(f"dataset_mixture_resample shape @ {n} docs", _mixture)
        docs.unpersist()


if __name__ == "__main__":
    main()
