"""Zipf / long-tail scale probes for the two newest shuffle-heavy ops
(r5 verdict #8), same harness as bench_r5_late3.

- Association mining (the `text_cooccurrence_pairs` SQL shape) over a
  ZIPFIAN vocabulary: token draws follow P(K=k) ~ k^-1.2 (hot token
  ~13% of draws), so a handful of tokens clear the 50% doc-support bar
  and the downward-closure prune IS the whole game — the pair self-join
  runs over only those frequent tokens' incidence rows, never the full
  C(tokens_per_doc, 2) per doc. Pass bar: seconds ~linear in docs while
  the frequent-single count stays flat (vocabulary-shaped, not
  corpus-shaped).
- `jaccard_join_prefix` over a LONG-TAIL shingle corpus (the operator's
  stated applicability regime — bench_r5_late3 measured the saturated
  and dup-dense stresses; this probe measures the regime the operator
  is FOR): 30 words/doc drawn from a ~1M-word vocabulary, ~8% of docs
  near-replicas of a cluster base with ONE word substituted (true
  jaccard ~0.85 on 14-char shingles) and ~4% exact replicas. Pass bar:
  candidates within a small multiple of true pairs, seconds ~linear
  10x -> 100x.

All corpora are xxhash64-deterministic (no RNG state, partition-
invariant) and repartitioned to 32 — a single-file-scan x broadcast
range is ONE partition (working-notes pitfall).

Usage: python scripts/bench_r6_assoc_ssjoin.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries.text_ops import (
    _cooc_docs_sql,
    _cooc_read_sql,
)
from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.operators.dedup import jaccard_join_prefix
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def zipf_docs(spark, n_docs: int, toks_per_doc: int = 20):
    """Each doc: `toks_per_doc` tokens with zipf(s=1.2) ids via the
    inverse-CDF power law k = floor((1-u)^(-1/(s-1))) on xxhash-uniform
    u (same construction as bench_r4_skew.zipf_frame)."""
    u = (
        "(CAST(pmod(xxhash64(id, j), 1000000) AS DOUBLE) + 0.5) / 1000000.0"
    )
    # clamp in DOUBLE before the BIGINT cast — ANSI mode raises
    # CAST_OVERFLOW for u near 1 (pow -> 1e30) if cast first
    tok = (
        f"concat('t', CAST(CAST(least(pow(1.0 - {u}, -5.0), 99999999.0)"
        f" AS BIGINT) AS STRING))"
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"array_join(transform(sequence(1, {toks_per_doc}), j -> {tok}), ' ')"
            ).alias("text"),
        )
        .repartition(32)
    )


def longtail_docs(spark, n_docs: int, words: int = 30, cluster: int = 25):
    """~1M-word vocabulary (every shingle rare), docs grouped in
    clusters of `cluster`; within a cluster, id%100 < 8 substitutes ONE
    word of the base doc (near-dup, J~0.85 on 14-char shingles),
    id%100 in [8, 12) is an exact replica, the rest are fresh docs."""
    base_words = (
        "transform(sequence(1, {w}), j -> substring(hex(xxhash64(src, j)), 1, 8))"
    ).format(w=words)
    return (
        spark.range(n_docs)
        .withColumn("h", F.expr("pmod(xxhash64(id, 777), 100)"))
        .withColumn(
            "src",
            F.expr("CASE WHEN pmod(xxhash64(id, 777), 100) < 12 "
                   "THEN id - pmod(id, {c}) ELSE id END".format(c=cluster)),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(CASE WHEN h < 8 THEN "
                f"  transform({base_words}, (w, i) -> "
                "     CASE WHEN i = CAST(pmod(id, {w}) AS INT) "
                "          THEN substring(hex(xxhash64(id, -1)), 1, 8) ELSE w END) "
                f" ELSE {base_words} END, ' ')".format(w=words)
            ).alias("text"),
        )
        .repartition(32)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 100x tiers")
    args = ap.parse_args()
    spark = get_spark("bench-r6-assoc-ssjoin")

    # ---- association mining over zipf vocabulary
    tiers = [50_000, 500_000] + ([5_000_000] if args.full else [])
    for n in tiers:
        docs = zipf_docs(spark, n).localCheckpoint(eager=True)
        docs.createOrReplaceTempView("probe_docs")

        def run():
            inc = spark.sql(
                _cooc_docs_sql(D.SPARK, "probe_docs")
            ).localCheckpoint(eager=False)
            inc.createOrReplaceTempView("probe_incidence")
            nf = inc.groupBy("tok").count()
            nd = inc.select("doc_id").distinct().count()
            n_freq = nf.filter(F.col("count") * 2 >= nd).count()
            pairs = spark.sql(
                "WITH d AS (SELECT doc_id, tok FROM probe_incidence)"
                + _cooc_read_sql("d")
            ).count()
            return f"{n_freq} frequent singles, {pairs} frequent pairs"

        timed(f"assoc frequent-pairs @ {n} zipf docs", run)
        docs.unpersist()

    # ---- exact SSJoin over long-tail shingles
    tiers = [5_000, 50_000] + ([500_000] if args.full else [])
    for n in tiers:
        docs = longtail_docs(spark, n).localCheckpoint(eager=True)
        n_pairs = {}
        t = timed(
            f"jaccard_join_prefix t=0.8 n=14 @ {n} longtail docs",
            lambda: n_pairs.setdefault(
                "v",
                jaccard_join_prefix(docs, threshold=0.8, shingle_n=14).count(),
            ),
        )
        print(f"  -> {n_pairs['v']} true pairs, {n / max(t, 1e-9):.0f} docs/s")
        docs.unpersist()


if __name__ == "__main__":
    main()
