"""Timed comparison: interpreted-HOF minhash signatures vs the exploded
hash-aggregate shape in operators/dedup.add_minhash, on a >=100k-doc
corpus (25x replicas of sf0.1 documents, salted).

Usage: python scripts/bench_minhash_scale.py
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from nyc_taxi_bigdata_pipeline_spark.operators import dedup
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

REPLICAS = 25
NUM_HASHES = 32


def old_add_minhash(df, text_col="text", num_hashes=NUM_HASHES):
    """Pre-round-2 formulation: N interpreted transform() lambdas per
    row, each re-hashing every shingle STRING. Kept for the comparison."""
    out = df.withColumn("__sh", dedup._legacy_char_shingles(text_col))
    sigs = [
        F.array_min(F.expr(f"transform(__sh, s -> xxhash64(s, {seed}))")).alias(f"mh{seed}")
        for seed in range(num_hashes)
    ]
    return out.select("*", *sigs).drop("__sh")


def main() -> None:
    spark = get_spark("bench-minhash-scale")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    corpus = (
        docs.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("salt"), F.col("rep"))).alias("text"),
        )
        # the crossJoin inherits the single-file scan's ONE partition —
        # spread the corpus so the comparison runs on all cores
        .repartition(32, "doc_id")
        .persist()
    )
    n = corpus.count()
    print(f"corpus: {n} docs, {NUM_HASHES} hashes", file=sys.stderr)

    # consume EVERY signature column (cheap MAX) — referencing only a few
    # would let Catalyst prune the unused hash passes and void the
    # comparison (the two formulations use different hash families, so no
    # value-identity claim here — the LSH tests pin behavior instead)
    chk = [F.count("*").alias("n")] + [
        F.max(F.col(f"mh{k}")).alias(f"c{k}") for k in range(NUM_HASHES)
    ]

    t0 = time.monotonic()
    new = dedup.add_minhash(corpus, num_hashes=NUM_HASHES).agg(*chk).first()
    t_new = time.monotonic() - t0
    print(f"exploded: {t_new:.2f}s n={new['n']}", file=sys.stderr)

    t0 = time.monotonic()
    old = old_add_minhash(corpus).agg(*chk).first()
    t_old = time.monotonic() - t0
    print(f"interpreted: {t_old:.2f}s n={old['n']}", file=sys.stderr)

    print(
        f'{{"docs": {n}, "num_hashes": {NUM_HASHES}, "exploded_sec": {t_new:.2f}, '
        f'"interpreted_sec": {t_old:.2f}, "speedup": {t_old / t_new:.1f}}}'
    )
    spark.stop()


if __name__ == "__main__":
    main()
