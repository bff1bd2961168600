"""r13 scale receipts (VERDICT r12 item 5): the r12 structural stagings
whose fixture timing was flat must show their advantage GROWING with N.

Arms per query, best-of-N ROUND-ROBIN (the repo's JIT-order rule):

- staged:   the shipped code (lazy localCheckpoints materialize the
            shared frames once inside the timed action)
- unstaged: ``DataFrame.localCheckpoint`` patched to identity for the
            build — the pre-r12 shape where every consumer re-inlines
            (and so re-executes) the shared frame's subtree

Run against a salted N× copy of sf0.1 (scripts/make_scaled_testdata.py)
so the corpus passes the staging saves actually scale.

Usage:
    python scripts/make_scaled_testdata.py --reps 10 --out /tmp/sf1x10
    python scripts/bench_r13_scale_receipts.py --sf-dir /tmp/sf1x10
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.dataframe as _dfmod  # noqa: E402

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY  # noqa: E402
from nyc_taxi_bigdata_pipeline_spark.session import get_spark  # noqa: E402

QUERIES = [
    "drift_psi_value",          # r12 §11 staged-view idiom
    "curation_domain_mixture",  # r12 §11 staged-view idiom
    "fuzzy_join_levenshtein",   # r12 §8 editdist base staging
    "ann_ivfpq_topk",           # r12 §10 sub_corpus staging
]

_ORIG_CKPT = _dfmod.DataFrame.localCheckpoint


def _identity_ckpt(self, eager=True):  # noqa: ANN001
    return self


def _release(spark) -> None:
    import gc

    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.catalog.dropTempView(t.name)
    gc.collect()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1x10")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--queries", default=",".join(QUERIES))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    spark = get_spark("r13-scale-receipts")
    # warm codegen per query at the bench SF
    for n in names:
        REGISTRY[n].spark_fn(spark, "/root/testdata/sf0.001").collect()
        _release(spark)

    best: dict[tuple[str, str], float] = {}
    for p in range(args.passes):
        for n in names:
            for arm in ("staged", "unstaged"):
                if arm == "unstaged":
                    _dfmod.DataFrame.localCheckpoint = _identity_ckpt
                try:
                    spark.sparkContext.setJobDescription(f"{n}:{arm} p{p}")
                    t0 = time.perf_counter()
                    REGISTRY[n].spark_fn(spark, args.sf_dir).collect()
                    dt = time.perf_counter() - t0
                finally:
                    _dfmod.DataFrame.localCheckpoint = _ORIG_CKPT
                    _release(spark)
                key = (n, arm)
                best[key] = min(best.get(key, float("inf")), dt)
                print(f"pass{p} {n}[{arm}] {dt:.2f}s", flush=True)
    print("---- best-of-%d ----" % args.passes)
    for n in names:
        s, u = best[(n, "staged")], best[(n, "unstaged")]
        print(f"{n}: staged {s:.2f}s  unstaged {u:.2f}s  ratio {u / s:.2f}x")
    spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
