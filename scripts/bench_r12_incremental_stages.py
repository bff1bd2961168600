"""r12 stage probe for dedup_incremental_batch (8.3 s in the r12 audit,
barely moved by the verify-checkpoint fixes): attribute time to the
operator's stages — corpus index build, batch signatures, cross
candidates, cross verify, within-batch dedup, cluster collapse — each
timed via the noop sink / count, best-of-2 round-robin (CLAUDE.md JIT
rule). Mirrors the registry query's exact settings (80/20 modulo split,
threshold 0.8, xxhash64, 32 hashes / 8 bands).

Usage: python scripts/bench_r12_incremental_stages.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from nyc_taxi_bigdata_pipeline_spark.operators import dedup as dd
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("bench-r12-incremental-stages")
    sc = spark.sparkContext

    def stages():
        docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "text")
        corpus = docs.filter(F.pmod("doc_id", F.lit(5)) != 4)
        batch = docs.filter(F.pmod("doc_id", F.lit(5)) == 4)
        index = dd.minhash_band_index(corpus)
        new_sigs = dd.add_minhash(
            batch.select("doc_id", "text"), "text", 32, "doc_id"
        ).localCheckpoint(eager=False)
        nb = dd.band_rows(new_sigs, "doc_id", 32, 8)
        cross = (
            nb.join(
                index.select(F.col("doc_id").alias("__cid"), "band_id", "bh"),
                ["band_id", "bh"],
            )
            .select(F.col("doc_id").alias("id_a"), F.col("__cid").alias("id_b"))
            .distinct()
            .filter(F.col("id_a") != F.col("id_b"))
            .localCheckpoint(eager=False)
        )
        cand_corpus = corpus.select("doc_id", "text").join(
            cross.select(F.col("id_b").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
        docs_both = batch.select("doc_id", "text").unionByName(cand_corpus)
        confirmed = dd.jaccard_verify_arrow(cross, docs_both, threshold=0.8)
        contaminated = confirmed.select(F.col("id_a").alias("doc_id")).distinct()
        survivors = batch.join(contaminated, "doc_id", "left_anti").localCheckpoint(
            eager=False
        )
        in_batch = dd.minhash_dedup(
            survivors, threshold=0.8, sigs=new_sigs
        )
        full = dd.dedup_incremental(batch, corpus, index, threshold=0.8)
        return {
            "index(corpus sigs+bands)": index,
            "cross candidates": cross,
            "cross verify": confirmed,
            "survivors": survivors,
            "in_batch pairs": in_batch,
            "full dedup_incremental": full,
        }

    results: dict[str, float] = {}
    for _ in range(args.repeat):
        for name, df in stages().items():
            sc.setJobDescription(name)
            dt = noop(df)
            results[name] = min(results.get(name, float("inf")), dt)
    for name, dt in results.items():
        print(f"{name:28s} {dt:7.2f} s", flush=True)
    s = stages()
    print("cross count:", s["cross candidates"].count())
    print("in_batch count:", s["in_batch pairs"].count())
    spark.stop()


if __name__ == "__main__":
    main()
