"""Linearity probes for the remaining r10 one-pass ops: the Gopher
heuristic filter and the embedding drift monitor. Both are single-scan
aggregate shapes (no joins, no windows over raw keys), so the probe is
a tier table confirming ~linear wall and a multi-partition layout —
collect + checksum, never a prunable count (CLAUDE.md).

Usage: python scripts/bench_r10_misc.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.benchqueries.curation_ops import _gopher_rules
from nyc_taxi_bigdata_pipeline_spark.benchqueries.similarity_ops import (
    _embedding_drift,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r10_winnowing import synth_docs
from scripts.bench_r4_skew import timed


def gopher_probe(spark, tiers) -> None:
    for n in tiers:
        docs = synth_docs(spark, n)
        docs.createOrReplaceTempView("probe_gopher_docs")
        got = {}
        timed(
            f"gopher_rules @ {n} docs",
            lambda: got.setdefault(
                "rows",
                spark.sql(_gopher_rules(D.SPARK, "probe_gopher_docs")).collect(),
            )
            and None,
        )
        rows = got["rows"]
        assert sum(r.docs for r in rows) == n
        print(
            f"  -> kept {sum(r.docs_kept for r in rows)}/{n}, "
            f"checksum {sum(r.fail_word_count + r.fail_stopwords for r in rows)}"
        )


def drift_probe(spark, tiers) -> None:
    for n in tiers:
        emb = (
            spark.range(n)
            .selectExpr(
                "id AS vec_id",
                "transform(sequence(0, 63), i -> "
                "CAST(CAST(pmod(xxhash64(id, i, 3), 2000001) - 1000000 AS DOUBLE)"
                " / 1000000.0 AS FLOAT)) AS embedding",
                "CAST(id % 8 AS INT) AS label",
            )
            .repartition(32, "vec_id")
            .localCheckpoint(eager=True)
        )
        emb.createOrReplaceTempView("probe_drift_emb")
        got = {}
        timed(
            f"embedding_drift @ {n} vectors",
            lambda: got.setdefault(
                "rows",
                spark.sql(_embedding_drift(D.SPARK, "probe_drift_emb")).collect(),
            )
            and None,
        )
        rows = got["rows"]
        assert len(rows) == 64
        print(
            f"  -> drifted {sum(r.drifted for r in rows)}/64, "
            f"checksum {sum(r.n_ref + r.n_cand for r in rows)}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the top tiers")
    args = ap.parse_args()
    spark = get_spark("bench-r10-misc")
    # r11 (r10 verdict item 6): ×10 top tiers — 3M docs / 10M vectors
    doc_tiers = [30_000, 100_000] + ([300_000, 3_000_000] if args.full else [])
    vec_tiers = [100_000, 300_000] + ([1_000_000, 10_000_000] if args.full else [])
    gopher_probe(spark, doc_tiers)
    drift_probe(spark, vec_tiers)


if __name__ == "__main__":
    main()
