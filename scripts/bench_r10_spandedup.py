"""Scale probe for operators/curation.span_dedup_remove (r10 stretch op).

Corpus: n docs of ~60 hash-derived tokens; 10% of docs embed a shared
64-token boilerplate block (the cross-doc repeated substring), and 2%
replay the previous doc's full text (whole-doc duplication — the
degenerate case span removal must also handle). Collect + checksum
(never a prunable count, CLAUDE.md).

Pass bar: seconds ~linear in docs; exactly one canonical copy of the
boilerplate block survives corpus-wide (total kept boilerplate tokens
== one block), and replayed docs empty out to zero kept tokens.

Usage: python scripts/bench_r10_spandedup.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.curation import span_dedup_remove
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed

BOILER = " ".join(f"bp{i}" for i in range(64))


def synth_docs(spark, n_docs: int, words: int = 60):
    toks = ", ".join(
        f"concat('w', abs(xxhash64(id, {i}, 13)) % 50000)" for i in range(words)
    )
    uniq = f"concat_ws(' ', {toks})"
    base = (
        spark.range(n_docs)
        .selectExpr(
            "id AS doc_id",
            # 2%: replay previous doc's text; 10%: embed the boilerplate
            f"CASE WHEN id % 50 = 1 THEN NULL "
            f"     WHEN id % 10 = 3 THEN concat({uniq}, ' ', '{BOILER}') "
            f"     ELSE {uniq} END AS text",
            "id % 50 = 1 AS is_replay",
        )
    )
    prev = base.selectExpr("doc_id + 1 AS doc_id", "text AS prev_text")
    return (
        base.join(prev, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "CASE WHEN is_replay THEN prev_text ELSE text END AS text",
        )
        .repartition(32, "doc_id")
        .localCheckpoint(eager=True)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the 300k tier")
    args = ap.parse_args()
    spark = get_spark("bench-r10-spandedup")

    for n in [30_000, 100_000] + ([300_000] if args.full else []):
        docs = synth_docs(spark, n)
        got = {}
        timed(
            f"span_dedup_remove @ {n} docs",
            lambda: got.setdefault(
                "rows",
                span_dedup_remove(docs, k=8)
                .select("doc_id", "n_tokens", "tokens_removed", "dup_spans",
                        F.size(F.split("clean_text", " ")).alias("kept"))
                .collect(),
            )
            and None,
        )
        rows = got["rows"]
        checksum = sum(r.tokens_removed + r.dup_spans for r in rows)
        # one canonical boilerplate block survives corpus-wide
        n_boiler_docs = sum(1 for r in rows if r.n_tokens >= 60 + 64)
        removed_boiler = sum(
            r.tokens_removed for r in rows if r.n_tokens >= 60 + 64
        )
        print(
            f"  -> {len(rows)} docs, checksum {checksum}, "
            f"boiler docs {n_boiler_docs}, boiler tokens removed "
            f"{removed_boiler} (expect ~{(n_boiler_docs - 1) * 64})"
        )


if __name__ == "__main__":
    main()
