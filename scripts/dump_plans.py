"""Snapshot the formatted physical plans of every bench-flagged registry
query into reports/plans/ — reviewable evidence that filters push down,
dims broadcast, and the hot path stays in whole-stage codegen, without
re-running the queries.

Usage: python scripts/dump_plans.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan
from nyc_taxi_bigdata_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="reports/plans")
    ap.add_argument("--suffix", default="", help="filename suffix, e.g. _before")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated registry names (default: bench set + plan-risk)",
    )
    args = ap.parse_args()

    spark = get_spark("dump-plans")
    os.makedirs(args.out, exist_ok=True)
    # bench-flagged queries, plus the plan-risk family whose failure
    # class is invisible in timings alone (CTE-inlining rescans,
    # nested-loop decorrelation): recursive CTE, LATERAL, the four
    # sketches, the deterministic epoch shuffle
    plan_risk = {
        "recursive_hierarchy_depth", "lateral_top_orders",
        "cms_heavy_hitters", "hll_distinct_by_type", "bloom_membership",
        "hdr_quantile_sketch", "dataset_global_shuffle",
        # round-5 late: MG's Arrow sketch + 1-row-anchor recount, and the
        # prefix SSJoin's freq-join/window/equi-join chain (its failure
        # class — a hinted broadcast of the Heaps-law freq dim — is
        # invisible in small-SF timings)
        "mg_heavy_hitters_tokens", "dedup_ssjoin_prefix",
    }
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        unknown = [n for n in names if n not in REGISTRY]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    else:
        names = sorted({n for n, q in REGISTRY.items() if q.bench} | plan_risk)
    cap = 100_000
    for name in names:
        plan = physical_plan(REGISTRY[name].spark_fn(spark, args.sf_dir))
        if len(plan) > cap:
            # iterative queries returning a persisted frame print the
            # whole nested InMemoryRelation chain — the evidence (join
            # strategies, scan shapes) is all in the head
            plan = plan[:cap] + f"\n... [truncated {len(plan) - cap} chars]"
        with open(os.path.join(args.out, f"{name}{args.suffix}.txt"), "w") as f:
            f.write(f"== {name} (sf_dir={args.sf_dir}) ==\n{plan}\n")
        print(name, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
