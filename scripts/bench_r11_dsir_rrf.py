"""Scale probes for the r11 additions curation_dsir_select and
search_hybrid_rrf (benchqueries/curation_ops, benchqueries/search_ops).

DSIR: replicate sf0.1 documents (salted per replica so gram sets
differ) and drive the SAME templated grams + read SQL the registry
query runs. One featurize pass + 1024-bucket agg + broadcast ratio
join + per-doc sum — the pass bar is ~linear wall across tiers.

RRF: replicate documents AND embeddings with aligned ids and drive the
registry query's internals (cand/tf/emb views + fused read SQL). Both
arms are probe-bounded (postings semi-join / 3-probe broadcast scan),
so wall should scale with the corpus scan, not the fusion.

Probe rules (CLAUDE.md): collect() and fold a checksum from the
output — never a prunable count.

Usage: python scripts/bench_r11_dsir_rrf.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.benchqueries.curation_ops import (
    _dsir_grams_sql,
    _dsir_read_sql,
    _dsir_toks_sql,
)
from nyc_taxi_bigdata_pipeline_spark.benchqueries.search_ops import (
    _rrf_cand_sql,
    _rrf_emb_sql,
    _rrf_read_sql,
    _rrf_tf_sql,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


def timed(label: str, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{label}: {time.monotonic() - t0:.1f} s")
    sys.stdout.flush()
    return out


def _replicate_docs(spark, reps: int):
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "source"
    )
    return (
        docs.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.concat_ws(
                " ", "text", F.concat(F.lit("salt"), F.col("rep"))
            ).alias("text"),
            "source",
        )
        .repartition(32, "doc_id")
        .localCheckpoint(eager=True)
    )


def dsir_tier(spark, reps: int) -> None:
    corpus = _replicate_docs(spark, reps)
    n = corpus.count()
    corpus.createOrReplaceTempView("probe_dsir_docs")

    def go():
        toks = spark.sql(
            _dsir_toks_sql(D.SPARK, "probe_dsir_docs")
        ).localCheckpoint(eager=False)
        toks.createOrReplaceTempView("probe_dsir_toks")
        grams = spark.sql(
            _dsir_grams_sql(D.SPARK, "probe_dsir_toks")
        ).localCheckpoint(eager=False)
        grams.createOrReplaceTempView("probe_dsir_grams")
        return spark.sql(_dsir_read_sql("probe_dsir_grams")).collect()

    rows = timed(f"dsir_select @ {n} docs", go)
    assert len(rows) == 20
    checksum = sum(r.sum_lw for r in rows) + sum(r.doc_id for r in rows)
    n_target = sum(1 for r in rows if r.source == "src0")
    print(f"  -> top-20 checksum {checksum}, {n_target}/20 from target")
    assert n_target >= 10, "steering lost at scale"
    for v in ("probe_dsir_docs", "probe_dsir_toks", "probe_dsir_grams"):
        spark.catalog.dropTempView(v)
    corpus.unpersist()


def rrf_tier(spark, reps: int) -> None:
    corpus = _replicate_docs(spark, reps)
    n = corpus.count()
    corpus.createOrReplaceTempView("probe_rrf_docs")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    bige = (
        emb.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
        .select(
            (F.col("vec_id") * reps + F.col("rep")).alias("vec_id"),
            "embedding",
        )
        .repartition(32, "vec_id")
        .localCheckpoint(eager=True)
    )
    ne = bige.count()
    bige.createOrReplaceTempView("probe_rrf_emb_raw")

    def go():
        cand = spark.sql(
            _rrf_cand_sql("probe_rrf_docs", "probe_rrf_emb_raw")
        ).repartition(32, "doc_id")
        cand.createOrReplaceTempView("probe_rrf_cand")
        tf = spark.sql(_rrf_tf_sql(D.SPARK, "probe_rrf_cand")).localCheckpoint(
            eager=False
        )
        tf.createOrReplaceTempView("probe_rrf_tf")
        spark.sql(
            _rrf_emb_sql("probe_rrf_docs", "probe_rrf_emb_raw")
        ).createOrReplaceTempView("probe_rrf_embv")
        return spark.sql(
            _rrf_read_sql(D.SPARK, "probe_rrf_tf", "probe_rrf_embv")
        ).collect()

    rows = timed(f"hybrid_rrf @ {n} docs / {ne} vecs", go)
    assert len(rows) == 30
    checksum = sum(round(r.rrf_score * 1e9) + r.cand_id for r in rows)
    print(f"  -> 30 fused rows, checksum {checksum}")
    for v in (
        "probe_rrf_docs probe_rrf_emb_raw probe_rrf_cand "
        "probe_rrf_tf probe_rrf_embv"
    ).split():
        spark.catalog.dropTempView(v)
    corpus.unpersist()
    bige.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the 1.5M tier")
    args = ap.parse_args()
    spark = get_spark("bench-r11-dsir-rrf")
    for reps in [20, 100] + ([300] if args.full else []):
        dsir_tier(spark, reps)
    for reps in [20, 100] + ([300] if args.full else []):
        rrf_tier(spark, reps)


if __name__ == "__main__":
    main()
