"""Scale probes for the r9 text ops: language-ID scorer and the
quality-classifier inference path.

Corpora are xxhash64-deterministic, repartitioned to 32 (single-file
scan = ONE partition pitfall), with per-language vocabulary bias so the
langid probe also sanity-checks discrimination at scale. Probes
collect() their (tiny) outputs and fold a checksum — never .count() of
a prunable plan (CLAUDE.md).

- langid: drives the SHIPPED registry shape (_langid_grams_sql ->
  lazy-checkpointed gram counts -> _langid_read_sql), i.e. the one
  corpus pass + vocabulary-sized model joins. Expect ~linear in total
  chars; the model side is |langs| x 512 regardless of SF.
- quality: drives operators/curation.quality_logistic_scores (the
  xxhash64 production path) with a 64-bucket weight table. Expect
  ~linear: one explode + two map-side-combined aggs, broadcast weights.

Usage: python scripts/bench_r9_textops.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries.curation_ops import _qw_nano
from nyc_taxi_bigdata_pipeline_spark.benchqueries.text_ops import (
    langid_confusion,
)
from nyc_taxi_bigdata_pipeline_spark.operators.curation import (
    quality_logistic_scores,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed

LANGS = ["aa", "bb", "cc", "dd", "ee"]


def synth_docs(spark, n_docs: int, words: int = 60):
    """Per-doc language from a hash; tokens drawn from a 10k-word
    shared vocabulary PLUS a per-language 2k-word private slice (every
    3rd token) — enough signal that a working scorer beats chance by a
    wide margin, while most mass stays shared (the realistic case)."""
    lang_expr = (
        "element_at(array(" + ",".join(f"'{l}'" for l in LANGS) + "), "
        "CAST(pmod(xxhash64(id, 11), 5) + 1 AS INT))"
    )
    tok = (
        "CASE WHEN j % 3 = 0 "
        "THEN concat(lang, substring(hex(xxhash64(doc_id, j, 1)), 1, 3)) "
        "ELSE concat('w', pmod(xxhash64(doc_id, j, 2), 10000)) END"
    )
    return (
        spark.range(n_docs)
        .selectExpr("id AS doc_id", f"{lang_expr} AS lang")
        .selectExpr(
            "doc_id",
            "lang",
            f"array_join(transform(sequence(1, {words}), j -> {tok}), ' ') AS text",
            "concat('src', pmod(xxhash64(doc_id, 13), 20)) AS source",
        )
        .repartition(32)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 300k tier")
    args = ap.parse_args()
    spark = get_spark("bench-r9-textops")

    tiers = [30_000, 100_000] + ([300_000] if args.full else [])
    for n in tiers:
        docs = synth_docs(spark, n).localCheckpoint(eager=True)

        # ---- langid (shipped registry shape over a view)
        docs.createOrReplaceTempView("probe_langid_docs")
        got = {}

        def run_langid():
            got["rows"] = langid_confusion(spark, "probe_langid_docs").collect()

        timed(f"text_langid_score shape @ {n} docs", run_langid)
        rows = got["rows"]
        total = sum(r.n_docs for r in rows)
        diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
        chk = sum(r.n_docs * (i + 1) for i, r in enumerate(rows))
        print(
            f"  -> {len(rows)} confusion cells, {total} eval docs, "
            f"accuracy {diag / total:.3f} (chance 0.2), checksum {chk}"
        )
        assert diag / total > 0.5, "scorer should beat chance decisively"

        # ---- quality classifier inference (production operator)
        wdf = spark.createDataFrame(
            [(b, _qw_nano(b)) for b in range(64)], "fb INT, w_nano BIGINT"
        )
        got2 = {}
        timed(
            f"quality_logistic_scores @ {n} docs",
            lambda: got2.setdefault(
                "r",
                quality_logistic_scores(docs, wdf)
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("keep").cast("long")).alias("kept"),
                    F.sum("z_nano").alias("zsum"),
                )
                .collect()[0],
            )
            and None,
        )
        r = got2["r"]
        print(f"  -> {r.n} docs scored, {r.kept} kept, z-sum {r.zsum}")
        docs.unpersist()


if __name__ == "__main__":
    main()
