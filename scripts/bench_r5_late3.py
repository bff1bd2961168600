"""Scale probes for the session's last operator batch.

- mg_heavy_hitters over zipfian token streams (hot token ~13%): the MG
  candidate pass must stay one corpus scan with bounded per-partition
  state, the recount one broadcast-semi-join agg — flat-ish seconds
  across decades is the bar. Capacity 64 << distinct tokens, so the
  decrement path (not the exact-mode shortcut) is what's timed.
- jaccard_join_prefix at 1×/10× documents. Two stresses, both
  deliberate after measurement:
  (a) VOCABULARY SATURATION — the 31-word fixture yields only 2,041
      distinct 5-gram shingles for 5k docs (median shingle in 291
      docs), the structural worst case for prefix filtering ("rare"
      prefix tokens aren't); probed at the 1× tier only, and
      shingle_n=14 (312k distinct, median 2) shown alongside as the
      de-saturation knob.
  (b) DUP DENSITY — word ROTATION preserves the doc's CYCLIC shingle
      content, so every replica family is a true near-dup clique at
      ~0.9 jaccard (this was first assumed to make replicas distinct;
      the 10×-tier pair count said otherwise). The 10× tier is
      therefore an honest mass-duplication stress: ~210k TRUE pairs
      must all be found and verified — the exactness contract's cost
      floor is the true pair count itself.
- dedup_incremental at the same tiers: 80/20 modulo split, corpus
  index prebuilt OUTSIDE the timed section (that is the operator's
  whole premise: the index is yesterday's artifact).

Usage: python scripts/bench_r5_late3.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.dedup import (
    dedup_incremental,
    jaccard_join_prefix,
    minhash_band_index,
)
from nyc_taxi_bigdata_pipeline_spark.operators.skew import mg_heavy_hitters
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table
from scripts.bench_r4_skew import timed, zipf_frame

SRC = "/root/testdata/sf0.1"


def rotated_docs(spark, reps: int):
    """reps distinct pseudo-docs per source doc: words rotated by a
    rep-dependent offset (distinct char-shingle sets, same vocabulary)."""
    docs = load_table(spark, SRC, "documents")
    rot = (
        docs.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .withColumn("__w", F.split(F.trim("text"), " "))
        .withColumn(
            "__off", (F.pmod(F.col("doc_id") * reps + F.col("rep"), F.size("__w")) + 1)
        )
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr("concat(slice(__w, __off, size(__w) - __off + 1), "
                       "slice(__w, 1, __off - 1))"),
            ).alias("text"),
        )
        .repartition(32)
    )
    return rot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()
    spark = get_spark("bench-r5-late3")

    tiers = (1_500_000, 15_000_000, 150_000_000) if args.full else (1_500_000, 15_000_000)
    for rows in tiers:
        toks = (
            zipf_frame(spark, rows)
            .select(F.concat(F.lit("t"), F.col("k")).alias("token"))
            .localCheckpoint(eager=True)
        )
        timed(
            f"mg_heavy_hitters @ {rows} zipf tokens (cap=64)",
            lambda: len(mg_heavy_hitters(toks, "token", 64).collect()),
        )
        toks.unpersist()

    for reps in (1, 10):
        docs = rotated_docs(spark, reps).localCheckpoint(eager=True)
        n = docs.count()
        if reps == 1:
            timed(
                f"jaccard_join_prefix @ {n} docs (t=0.8, n=5 SATURATED)",
                lambda: jaccard_join_prefix(docs, threshold=0.8).count(),
            )
        timed(
            f"jaccard_join_prefix @ {n} docs (t=0.8, n=14)",
            lambda: jaccard_join_prefix(
                docs, threshold=0.8, shingle_n=14
            ).count(),
        )
        corpus = docs.filter(F.pmod("doc_id", F.lit(5)) != 4)
        batch = docs.filter(F.pmod("doc_id", F.lit(5)) == 4)
        index = minhash_band_index(corpus).localCheckpoint(eager=True)
        timed(
            f"dedup_incremental @ {n} docs (batch=20%)",
            lambda: dedup_incremental(batch, corpus, index).count(),
        )
        index.unpersist()
        docs.unpersist()


if __name__ == "__main__":
    main()
