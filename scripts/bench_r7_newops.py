"""Scale probes for the r7 additions (same harness as bench_r6_assoc_ssjoin).

- `containment_join_prefix` over a long-tail corpus with planted SUBSET
  docs — the operator's stated regime (quote/subset detection): ~8% of
  docs are word-prefix truncations of a cluster base (char-14-gram
  shingle sets strictly contained, C(sub→base)=1.0, reverse ~0.37 —
  below threshold, so direction matters), ~4% exact replicas. The
  smallest tier cross-checks the prefix-filtered operator against a
  no-pruning full-postings brute force (losslessness at probe scale,
  complementing the DuckDB oracle at fixture scale). Pass bar: directed
  pairs match brute force, seconds ~linear 10x.
- `hopping_window_topk` SQL shape over synthetic events: constant 4x
  explode into a map-side-combinable agg. Pass bar: ~linear seconds.
- `robust_zscore_mad` SQL shape over synthetic events: group-partitioned
  rank windows (k groups sort independently). Pass bar: near-linear
  (per-group sort is n log n in the group size; group count is fixed,
  so the constant matters, not the shape).

All corpora are xxhash64-deterministic and repartitioned to 32 — a
single-file scan x broadcast range is ONE partition (working-notes
pitfall).

Usage: python scripts/bench_r7_newops.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries.behavior import _hopping_topk
from nyc_taxi_bigdata_pipeline_spark.benchqueries.stats_ops import _MAD_SQL
from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.operators.dedup import (
    containment_join_prefix,
    hashed_shingles,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def subset_corpus(spark, n_docs: int, words: int = 30, cluster: int = 25):
    """Long-tail vocabulary (8-hex words keyed by (src, j) — every
    shingle rare); docs in clusters of `cluster`: id%100 < 8 keeps only
    the FIRST 12 words of the cluster base (strict word-prefix → strict
    char-shingle subset), id%100 in [8,12) is an exact replica, the
    rest are fresh full-length docs."""
    base_words = (
        f"transform(sequence(1, {words}), j -> substring(hex(xxhash64(src, j)), 1, 8))"
    )
    return (
        spark.range(n_docs)
        .withColumn("h", F.expr("pmod(xxhash64(id, 777), 100)"))
        .withColumn(
            "src",
            F.expr(
                f"CASE WHEN pmod(xxhash64(id, 777), 100) < 12 "
                f"THEN id - pmod(id, {cluster}) ELSE id END"
            ),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "array_join(CASE WHEN h < 8 "
                f"THEN slice({base_words}, 1, 12) ELSE {base_words} END, ' ')"
            ).alias("text"),
        )
        .repartition(32)
    )


def containment_brute(spark, docs, threshold: float = 0.8, n: int = 14):
    """No-pruning directed containment: full postings self-join over ALL
    shared shingles, both directions — the probe-scale losslessness
    oracle for the prefix-filtered operator."""
    sh = hashed_shingles(docs, n=n).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "__h")
    b = sh.select(F.col("doc_id").alias("id_b"), "__h")
    inter = (
        a.join(b, "__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    j = inter.join(
        sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa")), "id_a"
    ).join(
        sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb")), "id_b"
    )
    fwd = j.select(
        F.col("id_a").alias("src_id"),
        F.col("id_b").alias("dst_id"),
        (F.col("i") / F.col("sa")).alias("containment"),
    )
    rev = j.select(
        F.col("id_b").alias("src_id"),
        F.col("id_a").alias("dst_id"),
        (F.col("i") / F.col("sb")).alias("containment"),
    )
    return fwd.union(rev).filter(F.col("containment") >= threshold)


def synth_events(spark, n: int, types: int = 8):
    """Deterministic event stream: ts spread over ~90 days, value in
    [0, 100) with a heavy tail on one type (gives the MAD probe real
    outliers)."""
    return (
        spark.range(n)
        .select(
            F.expr(
                "timestamp_micros(1704067200000000 + pmod(xxhash64(id, 1), 7776000) * 1000000)"
            ).alias("ts"),
            F.expr("concat('t', pmod(xxhash64(id, 2), {t}))".format(t=types)).alias(
                "event_type"
            ),
            F.expr(
                "CAST(pmod(xxhash64(id, 3), 10000) AS DOUBLE) / 100.0 "
                "+ CASE WHEN pmod(xxhash64(id, 4), 1000) = 0 THEN 5000.0 ELSE 0.0 END"
            ).alias("value"),
        )
        .repartition(32)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 100x tiers")
    args = ap.parse_args()
    spark = get_spark("bench-r7-newops")

    # ---- containment join over subset-planted long-tail corpus
    tiers = [5_000, 50_000] + ([500_000] if args.full else [])
    for n in tiers:
        docs = subset_corpus(spark, n).localCheckpoint(eager=True)
        got = {}
        t = timed(
            f"containment_join_prefix t=0.8 n=14 @ {n} subset-planted docs",
            lambda: got.setdefault(
                "v", containment_join_prefix(docs, threshold=0.8, shingle_n=14).count()
            ),
        )
        print(f"  -> {got['v']} directed pairs, {n / max(t, 1e-9):.0f} docs/s")
        if n == tiers[0]:
            ours = {
                (r.src_id, r.dst_id)
                for r in containment_join_prefix(
                    docs, threshold=0.8, shingle_n=14
                ).collect()
            }
            brute = {
                (r.src_id, r.dst_id)
                for r in containment_brute(spark, docs).collect()
            }
            assert ours == brute, (
                f"prefix filter dropped/added pairs: ours {len(ours)} "
                f"vs brute {len(brute)}"
            )
            print(f"  -> losslessness vs full-postings brute force OK ({len(brute)})")
        docs.unpersist()

    # ---- hopping-window agg over synthetic events
    for n in [1_000_000, 10_000_000] + ([100_000_000] if args.full else []):
        ev = synth_events(spark, n).localCheckpoint(eager=True)
        ev.createOrReplaceTempView("probe_events")
        timed(
            f"hopping_window_topk shape @ {n} events",
            lambda: spark.sql(_hopping_topk(D.SPARK, "probe_events")).count(),
        )
        ev.unpersist()

    # ---- robust MAD profile over synthetic events
    for n in [1_000_000, 10_000_000] + ([100_000_000] if args.full else []):
        ev = synth_events(spark, n).localCheckpoint(eager=True)
        ev.createOrReplaceTempView("probe_events")
        timed(
            f"robust_zscore_mad shape @ {n} events",
            lambda: spark.sql(_MAD_SQL.format(table="probe_events")).count(),
        )
        ev.unpersist()


if __name__ == "__main__":
    main()
