"""Scale probes for the round-5 late additions.

- key_skew_profile: zipfian 15M-row frame (hot key ~13%) — must stay a
  partial-agg shuffle + TakeOrderedAndProject; linearity across decades
  is the pass bar (the profile itself is the tool that would flag the
  hot key for every OTHER operator).
- chunk_tokens_overlap: 125k/500k salted docs — shuffle-free per-row
  expressions, so docs/s should be flat.
- semantic_dup_pairs / semantic_dedup: 20k -> 200k vectors (rotated
  replicas of sf0.1 embeddings), n_cells scaled with the corpus the way
  the SemDeDup recipe prescribes, so per-cell matmul stays bounded.
- resize_images: 5k synthetic 64x48 PPMs through decode->bilinear->
  re-encode (Arrow-batched; images/s is the number).

Usage: python scripts/bench_r5_newops.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.packing import chunk_tokens_overlap
from nyc_taxi_bigdata_pipeline_spark.operators.skew import key_skew_profile
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table
from scripts.bench_r4_ann import scaled_embeddings
from scripts.bench_r4_skew import timed, zipf_frame

SRC = "/root/testdata/sf0.1"


def salted_docs(spark, reps: int):
    docs = load_table(spark, SRC, "documents")
    return (
        docs.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("salt"), F.col("rep"))).alias("text"),
        )
        # the single-file sf0.1 scan crossJoined with a broadcast range is
        # ONE partition — a 100-TB scan has thousands of splits, so probing
        # a per-row operator on 1 partition measures nothing but the lack
        # of parallelism (first run read 25 s at 500k docs; 0.3 s at 32
        # partitions)
        .repartition(32)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the top tiers too")
    args = ap.parse_args()
    spark = get_spark("bench-r5-newops")

    # ---- skew profile over zipf keys
    tiers = (150_000, 1_500_000, 15_000_000) if args.full else (150_000, 1_500_000)
    for rows in tiers:
        df = zipf_frame(spark, rows).localCheckpoint(eager=True)
        timed(
            f"key_skew_profile @ {rows} zipf rows",
            lambda: len(key_skew_profile(df, "k", 10).collect()),
        )
        df.unpersist()

    # ---- chunker over salted docs
    for reps in (25, 100) if args.full else (25,):
        docs = salted_docs(spark, reps).localCheckpoint(eager=True)
        n = docs.count()
        t = timed(
            f"chunk_tokens_overlap @ {n} docs",
            lambda: chunk_tokens_overlap(docs, window=32, stride=24).count(),
        )
        print(f"  -> {n / t / 1000:.0f}k docs/s")
        docs.unpersist()

    # ---- SemDeDup at scaled corpus, n_cells scaled with it
    from nyc_taxi_bigdata_pipeline_spark.operators.similarity import (
        ivf_build,
        semantic_dedup,
        semantic_dup_pairs,
    )

    for reps, cells in ((40, 64), (400, 256)) if args.full else ((40, 64),):
        emb = scaled_embeddings(spark, reps).localCheckpoint(eager=True)
        n = emb.count()
        t0 = time.monotonic()
        index = ivf_build(emb, n_cells=cells, train_fraction=min(1.0, 50_000 / n),
                          materialize=True)
        build_s = time.monotonic() - t0
        print(f"semantic ivf_build @ {n} vecs / {cells} cells: {build_s:.1f} s")
        timed(
            f"semantic_dup_pairs @ {n} vecs",
            lambda: semantic_dup_pairs(emb, threshold=0.35, n_cells=cells,
                                       index=index).count(),
        )
        timed(
            f"semantic_dedup (pairs + collapse) @ {n} vecs",
            lambda: semantic_dedup(emb, threshold=0.35, n_cells=cells).count(),
        )
        emb.unpersist()

    # ---- resize throughput over synthetic PPMs
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        encode_ppm,
        resize_images,
    )

    rng = np.random.default_rng(11)
    n_img = 5000
    payloads = [
        ("m%05d" % i, "image",
         bytearray(encode_ppm(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))))
        for i in range(n_img)
    ]
    media = spark.createDataFrame(
        payloads, "media_id string, kind string, content binary"
    ).repartition(32).localCheckpoint(eager=True)
    t = timed(
        f"resize_images @ {n_img} imgs 64x48 -> 32x24",
        lambda: resize_images(media, 32, 24).count(),
    )
    print(f"  -> {n_img / t / 1000:.1f}k imgs/s")


if __name__ == "__main__":
    main()
