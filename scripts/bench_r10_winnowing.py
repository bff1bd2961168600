"""Scale probe for the winnowing fingerprint chain (r9 verdict item 4
— the only r9 op shipped without one).

Drives the SHIPPED registry shape (`_winnow_fps_sql` k-gram explode +
per-doc ROWS-window MIN -> lazy-checkpointed fingerprint set ->
`_winnow_read_sql` df/report aggregation) over a synthetic multi-source
corpus with a planted boilerplate phrase, at 30k / 100k / 300k docs of
~60 words each.

Pass bar:
  - seconds ~linear in docs (the k-gram explode is ~chars rows, the
    window MIN rides per-doc partitions, reporting is aggregate-only);
  - the plan inherits a multi-partition layout (probe repartitions by
    doc_id exactly like the registry query — the single-file-scan
    1-partition pitfall);
  - output collected and checksummed (never a prunable .count(),
    CLAUDE.md); planted boilerplate must register: the shared phrase
    is injected into >BOILER_DF docs per source, so boilerplate_hits
    must be > 0 for every source at every tier.

Usage: python scripts/bench_r10_winnowing.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries.text_ops import (
    _winnow_fps_sql,
    _winnow_read_sql,
)
from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def synth_docs(spark, n_docs: int, words: int = 60):
    """(doc_id, source, text): hash-derived tokens over a 10k vocab,
    4 sources; every doc carries one of 8 per-source boilerplate
    phrases (16 chars > k+w-1 = 11, so each is guaranteed >= 1 shared
    fingerprint across its >> BOILER_DF carriers)."""
    toks = ", ".join(
        f"concat('w', abs(xxhash64(id, {i}, 7)) % 10000)" for i in range(words)
    )
    return (
        spark.range(n_docs)
        .selectExpr(
            "id AS doc_id",
            "concat('src', CAST(id % 4 AS STRING)) AS source",
            f"concat_ws(' ', 'boilerplatephrase', "
            f"CAST(abs(xxhash64(id)) % 8 AS STRING), {toks}) AS text",
        )
        .repartition(32, "doc_id")
        .localCheckpoint(eager=True)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the 300k tier")
    ap.add_argument("--lm", action="store_true", help="also probe text_lm_perplexity")
    args = ap.parse_args()
    spark = get_spark("bench-r10-winnowing")

    for n in [30_000, 100_000] + ([300_000] if args.full else []):
        docs = synth_docs(spark, n)
        docs.createOrReplaceTempView("probe_winnow_docs")

        def run():
            fps = spark.sql(
                _winnow_fps_sql(D.SPARK, "probe_winnow_docs")
            ).localCheckpoint(eager=False)
            fps.createOrReplaceTempView("probe_winnow_fps")
            return spark.sql(_winnow_read_sql("probe_winnow_fps")).collect()

        got = {}
        timed(f"winnowing @ {n} docs", lambda: got.setdefault("rows", run()) and None)
        rows = got["rows"]
        checksum = sum(r.fingerprints + r.n_docs + r.boilerplate_hits for r in rows)
        assert len(rows) == 4, rows
        assert all(r.boilerplate_hits > 0 for r in rows), rows
        assert sum(r.n_docs for r in rows) == n
        print(
            f"  -> {len(rows)} sources, checksum {checksum}, "
            f"fp/doc {rows[0].fp_per_doc:.1f}, "
            f"boiler {[r.boilerplate_hits for r in rows]}"
        )
    _maybe_lm(spark, args)


def lm_probe(spark, tiers) -> None:
    """Linearity probe for the text_lm_perplexity shape (same synth
    corpus): stage the bi frame lazily, run the read SQL, collect +
    checksum. The corpus-scale join back (bi x cbi on (p_h, w_h)) is
    the only superlinear-risk stage."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries.text_ops import (
        _lm_bi_sql,
        _lm_read_sql,
    )

    for n in tiers:
        docs = synth_docs(spark, n)
        docs.createOrReplaceTempView("probe_lm_docs")

        def run():
            bi = spark.sql(
                _lm_bi_sql(D.SPARK, "probe_lm_docs")
            ).localCheckpoint(eager=False)
            bi.createOrReplaceTempView("probe_lm_bi")
            return spark.sql(_lm_read_sql("probe_lm_bi")).collect()

        got = {}
        timed(f"lm_perplexity @ {n} docs", lambda: got.setdefault("rows", run()) and None)
        rows = got["rows"]
        assert sum(r.docs for r in rows) == n
        print(
            f"  -> checksum {sum(r.nll_micro_total for r in rows)}, "
            f"avg_nll {rows[0].avg_nll_nats:.3f}, "
            f"outliers {sum(r.outlier_docs for r in rows)}"
        )


def _maybe_lm(spark, args) -> None:
    if args.lm:
        lm_probe(spark, [30_000, 100_000] + ([300_000] if args.full else []))


if __name__ == "__main__":
    main()
