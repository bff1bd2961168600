"""Full-text relevance search: BM25 (Okapi, Lucene-style positive IDF)
top-k document retrieval — the missing sibling of the embedding ANN
operators for CURATION-time retrieval (decontamination lookups,
quality-by-relevance filtering, eval-set mining all need a term-based
search over the corpus, not just a vector one).

Shape at 100 TB: two corpus passes build the postings statistics —
(doc, term) tf and per-doc length, both ONE shuffle keyed by doc then
term — and the per-query scoring touches only the query terms' postings
(a broadcast semi-join on a handful of terms), never the corpus. The
top-k cut is a per-query window Spark 4 executes as WindowGroupLimit
(rank pushed below the exchange).

Cross-engine determinism (the fixed-point discipline of
functions/compat.py + operators/text.unigram_logprob_features): BM25's
per-term score is ln(idf_arg) · tf_part where BOTH factors are single
IEEE operations on exact BIGINT-derived ratios —
idf_arg = 1 + (2·(N−df)+1)/(2·df+1) (the textbook (N−df+0.5)/(df+0.5)
cleared of decimal literals) and, for k1 = 1.2 / b = 0.75,
tf_part = 22·tf·T / (10·tf·T + 3·T + 9·dl·N) (the textbook
tf·(k1+1)/(tf + k1·(1−b) + k1·b·dl/avgdl) with avgdl = T/N cleared to
one integer ratio). The product snaps to fixed-point micro-units
(FLOOR(x·1e6 + 0.5) AS BIGINT) per (query, doc, term), the per-doc SUM
is exact-integer, and only the reported score divides back to double —
so Spark and DuckDB hash-match bit-exactly. k1/b are FIXED at the
Robertson defaults; generalizing them would re-introduce float
denominators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents per query by BM25 (k1=1.2, b=0.75), as
    ``(query_id, doc_id, score, rank)`` with a deterministic
    (score desc, doc_id asc) tiebreak. ``queries`` are (query_id, text)
    pairs; terms are whitespace-lowered and DEDUPLICATED per query
    (classic BM25 scores each distinct query term once)."""
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), " ")).alias("tok"),
    )
    # tf fans into dl / dfreq / scored (+ totals via dl) — the
    # CTE-inlining recompute class: one materialized postings pass
    # instead of four corpus tokenizes (lazy: the caller's first action
    # pays for it inside its own timing)
    tf = toks.groupBy(id_col, "tok").agg(
        F.count("*").cast("bigint").alias("tf")
    ).localCheckpoint(eager=False)
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("bigint").alias("dl"))
    dfreq = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    totals = dl.agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("dl").cast("bigint").alias("tt"),
    )

    qrows = sorted(
        {(int(qid), t) for qid, text in queries for t in text.lower().strip().split()}
    )
    qterms = spark.createDataFrame(qrows, "query_id int, tok string")

    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(dfreq, "tok")  # post-semi-join dfreq is query-term-sized; AQE broadcasts
        .join(dl, id_col)
        .join(F.broadcast(totals))
        .select(
            "query_id",
            id_col,
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (2 * (F.col("nd") - F.col("df")) + 1).cast("double")
                    / (2 * F.col("df") + 1).cast("double")
                )
                * (
                    (22 * F.col("tf") * F.col("tt")).cast("double")
                    / (
                        10 * F.col("tf") * F.col("tt")
                        + 3 * F.col("tt")
                        + 9 * F.col("dl") * F.col("nd")
                    ).cast("double")
                )
                * 1_000_000.0
                + 0.5
            )
            .cast("bigint")
            .alias("fp"),
        )
    )
    per_doc = scored.groupBy("query_id", id_col).agg(
        F.sum("fp").cast("bigint").alias("fp_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("fp_score"), F.asc(id_col)
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            (F.col("fp_score").cast("double") / 1_000_000.0).alias("score"),
            "rank",
        )
    )
