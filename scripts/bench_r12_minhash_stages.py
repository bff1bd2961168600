"""r12 stage-level probe for dedup_minhash_pipeline (15.9 s in the r12
--all audit vs 5.8 s rows-only in r11): attribute the cost to stages and
to the portable (md5) vs xxhash64 hash family, guide §1.1/§1.4 — each
stage timed via the noop sink, best-of-2 round-robin (CLAUDE.md JIT
rule).

Usage: python scripts/bench_r12_minhash_stages.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from nyc_taxi_bigdata_pipeline_spark.operators.dedup import (
    add_minhash,
    jaccard_verify_arrow,
    lsh_candidate_pairs,
    minhash_dedup,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def corpus_frame(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    base = docs.filter(F.col("doc_id") < 50)
    exact_dup = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    near_dup = base.withColumn("doc_id", F.col("doc_id") + 2_000_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzextra"))
    )
    corpus = docs.unionByName(exact_dup).unionByName(near_dup)
    return corpus.repartition(spark.sparkContext.defaultParallelism, "doc_id")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("bench-r12-minhash-stages")
    sc = spark.sparkContext

    def stages(family: str):
        corpus = corpus_frame(spark, args.sf_dir)
        sigs = add_minhash(corpus, "text", 16, "doc_id", hash_family=family)
        pairs = lsh_candidate_pairs(sigs, "doc_id", 16, 4, 256, family)
        full = minhash_dedup(
            corpus, num_hashes=16, bands=4, threshold=0.5, hash_family=family
        )
        verify_only = jaccard_verify_arrow(
            pairs, corpus, "doc_id", "text", 0.5, hash_family=family
        )
        return {
            "sigs": sigs,
            "pairs": pairs,
            "verify(pairs+shingle rebuild)": verify_only,
            "full": full,
        }

    results: dict[tuple[str, str], float] = {}
    for _ in range(args.repeat):
        for family in ("portable", "xxhash64"):
            for name, df in stages(family).items():
                sc.setJobDescription(f"{family}:{name}")
                dt = noop(df)
                key = (family, name)
                results[key] = min(results.get(key, float("inf")), dt)
    for (family, name), dt in results.items():
        print(f"{family:9s} {name:32s} {dt:7.2f} s")
    ssum = results[("portable", "pairs")]
    print(f"\ncandidate pairs count: ", end="")
    corpus = corpus_frame(spark, args.sf_dir)
    sigs = add_minhash(corpus, "text", 16, "doc_id", hash_family="portable")
    print(lsh_candidate_pairs(sigs, "doc_id", 16, 4, 256, "portable").count())
    spark.stop()


if __name__ == "__main__":
    main()
