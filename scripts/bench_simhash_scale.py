"""Timed comparison: interpreted-HOF SimHash vs the exploded hash-aggregate
shape in operators/dedup.add_simhash, on a >=100k-doc corpus.

Builds 25x replicas of sf0.1 documents (125k docs; each replica gets a
salt token appended so fingerprints differ) and times computing the full
simhash fingerprint for every doc under both formulations.

Usage: python scripts/bench_simhash_scale.py
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


def old_simhash64(col: str = "text") -> F.Column:
    """The pre-round-2 formulation: 63 interpreted aggregate() HOFs, each
    re-evaluating split(lower(trim(text))). Kept here only for the timed
    comparison."""
    toks = f"split(lower(trim({col})), ' ')"
    bits = []
    for b in range(63):
        vote = (
            f"aggregate({toks}, 0L, (acc, t) ->"
            f" acc + CASE WHEN (xxhash64(t) >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        )
        bits.append(f"(CASE WHEN {vote} > 0 THEN CAST({1 << b} AS LONG) ELSE 0L END)")
    return F.expr(" + ".join(bits))


def main() -> None:
    spark = get_spark("bench-simhash-scale")
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
    print(f"corpus: {n} docs", file=sys.stderr)

    def timed(label, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.2f}s ({out})", file=sys.stderr)
        return dt, out

    # new: exploded hash aggregate
    t_new, agg_new = timed(
        "exploded add_simhash",
        lambda: dedup.add_simhash(corpus).agg(
            F.count("*").alias("n"), F.sum(F.crc32(F.col("sh").cast("string"))).alias("chk")
        ).first(),
    )
    # old: interpreted HOF column
    t_old, agg_old = timed(
        "interpreted-HOF simhash64",
        lambda: corpus.select("doc_id", old_simhash64("text").alias("sh")).agg(
            F.count("*").alias("n"), F.sum(F.crc32(F.col("sh").cast("string"))).alias("chk")
        ).first(),
    )
    same = tuple(agg_new) == tuple(agg_old)
    print(
        f'{{"docs": {n}, "exploded_sec": {t_new:.2f}, "interpreted_sec": {t_old:.2f}, '
        f'"speedup": {t_old / t_new:.1f}, "fingerprints_identical": {str(same).lower()}}}'
    )
    spark.stop()


if __name__ == "__main__":
    main()
