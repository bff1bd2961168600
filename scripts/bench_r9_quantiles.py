"""Scale probe for the r8 grouped-quantile rewrite (r8 verdict flaw 1).

Runs the SHIPPED robust_zscore_mad path (stats_ops.mad_profile →
operators/quantiles.grouped_quantile_select, bucketed two-pass
selection) over the same synthetic event stream the r7 probe used for
the OLD rank-window shape, so the two series are directly comparable:

    old shape (r7, RESULTS.md): 1M 6.5 s | 10M 17.9 s | 100M 199.6 s
                                (11.2x for the last 10x hop — per-group
                                single-task sorts spill)

Pass bar: near-linear seconds across 1M → 10M → 100M, and the 100M
tier far below the old 199.6 s.

Probe discipline (CLAUDE.md): collect() the 8-row output and fold a
checksum — a .count() of the final groupBy would prune the median/MAD
aggregate columns and measure a cheaper plan. The 1M tier also
cross-checks the operator output against the one-shot rank-window SQL
(_MAD_SQL) row-for-row: same synthetic frame, both engines Spark, so
equality is exact.

Usage: python scripts/bench_r9_quantiles.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries.stats_ops import (
    _MAD_SQL,
    mad_profile,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed
from scripts.bench_r7_newops import synth_events


def checksum(rows) -> str:
    acc = 0.0
    for r in rows:
        acc += r.n + r.median_value * 3.0 + r.mad * 7.0 + r.n_outliers * 11.0
    return f"{len(rows)} rows, checksum {acc:.6f}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 100M tier")
    args = ap.parse_args()
    spark = get_spark("bench-r9-quantiles")

    for n in [1_000_000, 10_000_000] + ([100_000_000] if args.full else []):
        ev = synth_events(spark, n).localCheckpoint(eager=True)
        got = {}
        timed(
            f"robust_zscore_mad (shipped bucketed-selection path) @ {n} events",
            lambda: got.setdefault("rows", mad_profile(ev).collect()) and None,
        )
        print(f"  -> {checksum(got['rows'])}")
        if n == 1_000_000:
            ev.createOrReplaceTempView("probe_events")
            old = spark.sql(_MAD_SQL.format(table="probe_events")).collect()
            new = sorted(got["rows"], key=lambda r: r.event_type)
            old = sorted(old, key=lambda r: r.event_type)
            assert [tuple(r) for r in new] == [tuple(r) for r in old], (
                "operator output diverges from the rank-window SQL replay"
            )
            print("  -> exact match vs one-shot rank-window SQL replay OK")
        ev.unpersist()


if __name__ == "__main__":
    main()
