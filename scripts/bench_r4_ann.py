"""Round-4 ANN scale probe: brute-force vs IVF vs IVF-PQ at 100× the
embeddings table (2k → 200k vectors, dim 64), measuring the
recall/throughput dial the operators exist to provide.

Corpus generation mirrors make_scaled_testdata's embedding salting
(rotate by rep positions — norm preserved, direction changed, so the
neighbor structure grows linearly instead of 100 identical copies).
Queries are the first 20 base vectors; ground truth is brute-force
cosine top-k.

Usage: python scripts/bench_r4_ann.py [--reps 100] [--k 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators import similarity as sim
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"


def scaled_embeddings(spark, reps: int):
    e = load_table(spark, SRC, "embeddings").crossJoin(
        spark.range(reps).withColumnRenamed("id", "__rep")
    )
    dim = len(e.select("embedding").first()[0])
    rotated = F.expr(
        f"concat(slice(embedding, (CAST(__rep AS INT) % {dim}) + 1,"
        f" {dim} - (CAST(__rep AS INT) % {dim})),"
        f" slice(embedding, 1, CAST(__rep AS INT) % {dim}))"
    ).alias("embedding")
    return e.select(
        (F.col("vec_id") * reps + F.col("__rep")).alias("vec_id"), rotated
    )


def recall(got, truth, k):
    hits = 0
    for q, ids in truth.items():
        hits += len(set(got.get(q, [])) & set(ids))
    return hits / (len(truth) * k)


def topk_map(df, k):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["cos_sim"], r["neighbor_id"]))
    return {q: [n for _, n in sorted(v, reverse=True)[:k]] for q, v in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark("bench-r4-ann")

    corpus = scaled_embeddings(spark, args.reps).localCheckpoint(eager=True)
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") % args.reps == 0).filter(
        F.col("vec_id") < 20 * args.reps
    )
    nq = queries.count()
    print(f"corpus={n} vectors, {nq} queries, k={args.k}")

    t0 = time.monotonic()
    bf = sim.cosine_topk(corpus, queries, k=args.k)
    truth = topk_map(bf, args.k)
    dt_bf = time.monotonic() - t0
    print(f"brute-force: {dt_bf:.1f} s  ({n * nq / dt_bf:,.0f} pair-dots/s)")

    # build ONCE (the deployment shape) — quantizer trained on a 10%
    # sample, assignment materialized; searches amortize the build
    t0 = time.monotonic()
    index = sim.ivf_build(
        corpus, n_cells=64, train_fraction=0.1, materialize=True
    )
    dt_build = time.monotonic() - t0
    print(f"ivf_build cells=64 (10% train sample): {dt_build:.1f} s, once")

    for n_probe in (8, 16):
        t0 = time.monotonic()
        got = topk_map(
            sim.ivf_topk(corpus, queries, k=args.k, n_cells=64,
                         n_probe=n_probe, index=index),
            args.k,
        )
        dt = time.monotonic() - t0
        print(f"ivf search probe={n_probe}: {dt:.1f} s "
              f"({dt_bf / dt:.1f}x vs brute)  recall@{args.k}="
              f"{recall(got, truth, args.k):.3f}")

    t0 = time.monotonic()
    got = topk_map(
        sim.ivfpq_topk(corpus, queries, dim=64, k=args.k, n_cells=64, n_probe=16),
        args.k,
    )
    dt = time.monotonic() - t0
    print(f"ivf-pq cells=64 probe=16: {dt:.1f} s ({dt_bf / dt:.1f}x vs brute)  "
          f"recall@{args.k}={recall(got, truth, args.k):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
