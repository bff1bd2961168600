"""Scale probe for curation_url_dedup_cap's operator composition
(benchqueries/curation_ops). The fixture query runs on documents; this
probe drives the SAME canon SQL + MIN-per-URL + per_key_exact_sample
chain over a synthetic doc_id range so the tiers are corpus-sized:
~7 docs per page in 4 raw-URL variants, zipf-ish domains (freq ∝ 2i+1).

Pass bar: ~linear wall; per-domain invariants hold at every tier —
docs_total sums to n, urls_canonical == ceil-page counts, and
kept_after_cap == min(cap, urls_canonical) (the hash-range prefilter
never changes the selected set, pinned separately in
test_per_key_sample_prefilter_exact). Collect + checksum, never a
prunable count (CLAUDE.md).

Usage: python scripts/bench_r11_urldedup.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.benchqueries.curation_ops import (
    _URL_CAP,
    _URL_SEED,
    _url_canon_sql,
)
from nyc_taxi_bigdata_pipeline_spark.operators.sampling import per_key_exact_sample
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def run_tier(spark, n: int) -> None:
    (
        spark.range(n)
        .selectExpr("id AS doc_id")
        .repartition(32, "doc_id")
        .localCheckpoint(eager=True)
    ).createOrReplaceTempView("probe_url_docs")
    got = {}

    def go():
        canon = spark.sql(_url_canon_sql(D.SPARK, "probe_url_docs"))
        firsts = canon.groupBy("curl").agg(F.min("doc_id").alias("doc_id"))
        kept = canon.join(firsts.select("doc_id"), "doc_id", "left_semi")
        h = F.expr(D.seeded_h64("CAST(doc_id AS STRING)", _URL_SEED, D.SPARK))
        capped = per_key_exact_sample(
            kept.select("domain", "doc_id"), "domain", _URL_CAP,
            key_col="doc_id", order_hash=h, hash_range=(0, 1 << 60),
        )
        got["tot"] = canon.groupBy("domain").count().collect()
        got["uniq"] = kept.groupBy("domain").count().collect()
        got["cap"] = (
            capped.groupBy("domain")
            .agg(F.count("*").alias("c"), F.sum("doc_id").alias("s"))
            .collect()
        )

    timed(f"url_dedup_cap @ {n} docs", go)
    tot = {r["domain"]: r["count"] for r in got["tot"]}
    uniq = {r["domain"]: r["count"] for r in got["uniq"]}
    cap = {r["domain"]: (r["c"], r["s"]) for r in got["cap"]}
    assert sum(tot.values()) == n
    assert all(cap[d][0] == min(_URL_CAP, uniq[d]) for d in uniq)
    checksum = sum(s for _, s in cap.values())
    print(
        f"  -> {len(tot)} domains, {sum(uniq.values())} canonical pages "
        f"of {n} fetches, kept-id checksum {checksum}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the 10M tier")
    args = ap.parse_args()
    spark = get_spark("bench-r11-urldedup")
    for n in [300_000, 1_000_000] + ([10_000_000] if args.full else []):
        run_tier(spark, n)


if __name__ == "__main__":
    main()
