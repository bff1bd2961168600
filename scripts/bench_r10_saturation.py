"""Saturation-trio accounting (r9 verdict item 2).

The registry's entire slow tail is three dedup queries over the sf0.1
documents fixture (dedup_ssjoin_prefix ~20 s, dedup_components ~22 s,
dedup_containment ~13 s). The standing claim is "the cost is the
fixture, not the plan": the 31-word synthetic corpus saturates 5-gram
shingle space, so even frequency-ordered prefix tokens sit in hundreds
of docs and the candidate join degenerates toward its all-pairs floor.
This probe turns that claim into numbers at the DEFAULT shingle_n=5 and
the documented de-saturation tier n=14:

  docs, distinct shingles, median shingle df,
  candidate pairs generated (post prefix+length+positional filters),
  true pairs (verified J >= 0.8), candidate:true ratio,
  all-pairs floor C(docs, 2), wall seconds per phase.

Decision rule (from the verdict): if candidates are within a small
factor of the TRUE pair count, the work is irreducible for the chosen
similarity definition and the note lands in RESULTS.md; if candidates
dwarf true pairs, the registry queries should adopt n=14 (which changes
the similarity definition, so oracles re-pin in tandem).

Usage: python scripts/bench_r10_saturation.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.dedup import (
    hashed_shingles,
    jaccard_verify_arrow,
    prefix_filter_candidates,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench-r10-saturation")
    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs, all-pairs floor C(n,2) = {n_docs*(n_docs-1)//2}")

    for n in (5, 14):
        sh = hashed_shingles(docs, "doc_id", "text", n=n)
        vocab = sh.groupBy("__h").count()
        n_sh = vocab.count()
        med_df = vocab.selectExpr("median(count) AS m").collect()[0]["m"]

        t0 = time.time()
        cand = prefix_filter_candidates(docs, threshold=0.8, shingle_n=n)
        cand = cand.localCheckpoint(eager=True)
        n_cand = cand.count()
        t_cand = time.time() - t0

        t0 = time.time()
        true_pairs = jaccard_verify_arrow(
            cand, docs, "doc_id", "text", 0.8, shingle_n=n
        ).count()
        t_ver = time.time() - t0

        ratio = n_cand / max(true_pairs, 1)
        floor = n_docs * (n_docs - 1) // 2
        print(
            f"shingle_n={n}: {n_sh} distinct shingles (median df {med_df}), "
            f"candidates={n_cand} ({100.0*n_cand/floor:.1f}% of all-pairs), "
            f"true_pairs={true_pairs}, cand:true={ratio:.1f}x, "
            f"t_cand={t_cand:.1f}s t_verify={t_ver:.1f}s"
        )


if __name__ == "__main__":
    main()
