"""Throughput of the scale-path curation operators on a >=100k-doc corpus:
decontamination (broadcast benchmark grams), repetition stats, PII scrub,
and domain-mixture sampling (operators/curation.py).

Builds 25x replicas of sf0.1 documents (125k docs, salted per replica so
gram sets differ) and times each pass end to end.

Usage: python scripts/bench_curation_scale.py
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from nyc_taxi_bigdata_pipeline_spark.operators import curation
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

REPLICAS = 25


def main() -> None:
    spark = get_spark("bench-curation-scale")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "source"
    )
    corpus = (
        docs.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * REPLICAS + F.col("rep")).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("salt"), F.col("rep"))).alias("text"),
            "source",
        )
        .repartition(32, "doc_id")
        .persist()
    )
    n = corpus.count()
    print(f"corpus: {n} docs", file=sys.stderr)

    def timed(label: str, fn) -> None:
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label}: {dt:.1f} s ({n / dt / 1000:.0f}k docs/s) -> {out}")

    bench = docs.limit(200).select("doc_id", "text")  # a small eval suite
    timed(
        "decontaminate (3-gram, broadcast bench set)",
        lambda: curation.decontaminate(corpus, bench, n=3).count(),
    )
    timed(
        "repetition_stats (dup-word + top-bigram)",
        lambda: curation.repetition_stats(corpus).filter("repetitive").count(),
    )
    timed(
        "scrub_pii (3 patterns, codegen regex chain)",
        lambda: curation.scrub_pii(corpus)
        .agg(F.sum("email_redacted") + F.sum("phone_redacted") + F.sum("ipv4_redacted"))
        .first()[0],
    )
    weights = {f"src{i}": (0.3 if i < 2 else 0.4 / 18) for i in range(20)}
    timed(
        "domain_mixture_sample (20 domains)",
        lambda: curation.domain_mixture_sample(corpus, weights, target_total=n // 2).count(),
    )


if __name__ == "__main__":
    main()
