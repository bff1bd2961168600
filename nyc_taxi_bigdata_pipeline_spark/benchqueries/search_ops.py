"""Term-based retrieval + sequence-aware LM scoring over `documents`
(training-data extensions): BM25 top-k search and bigram-LM quality
scores. Both hash-match DuckDB bit-exactly via the fixed-point
discipline (see operators/search.py and operators/text.py docstrings —
every float is a single IEEE op on exact-integer-derived ratios,
snapped to micro-units before any aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from . import dialect as D
from .registry import register

# three fixed queries over the synthetic systems-vocabulary corpus;
# 'strategy' / 'pushdown' are deliberately OUT-of-vocabulary terms (df=0
# contributes no postings — the real-query shape), but each query keeps
# at least two in-vocabulary terms so every query returns a full top-k
_BM25_QUERIES = [
    (1, "hash join strategy"),
    (2, "columnar scan filter pushdown"),
    (3, "sort merge window stream"),
]
_BM25_K = 10


def _bm25_sql(engine: str, table: str) -> str:
    unnest = D.unnest_col(D.split_ws("lower(trim(text))", engine), engine)
    qrows = sorted(
        {(qid, t) for qid, text in _BM25_QUERIES for t in text.lower().split()}
    )
    values = ", ".join(f"({qid}, '{t}')" for qid, t in qrows)
    return f"""
    WITH toks AS (SELECT doc_id, {unnest} AS tok FROM {table}
                  WHERE text IS NOT NULL),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, tok),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(dl) AS BIGINT) AS tt
          FROM dl),
    q AS (SELECT * FROM (VALUES {values}) AS v(query_id, tok)),
    s AS (SELECT q.query_id, tf.doc_id,
                 CAST(FLOOR(LN(1.0 + CAST(2 * (n.nd - dfreq.df) + 1 AS DOUBLE)
                                     / CAST(2 * dfreq.df + 1 AS DOUBLE))
                            * (CAST(22 * tf.tf * n.tt AS DOUBLE)
                               / CAST(10 * tf.tf * n.tt + 3 * n.tt
                                      + 9 * dl.dl * n.nd AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS fp
          FROM tf JOIN q ON tf.tok = q.tok
                  JOIN dfreq ON tf.tok = dfreq.tok
                  JOIN dl ON tf.doc_id = dl.doc_id
                  CROSS JOIN n),
    per_doc AS (SELECT query_id, doc_id, CAST(SUM(fp) AS BIGINT) AS fp_score
                FROM s GROUP BY query_id, doc_id),
    ranked AS (SELECT query_id, doc_id, fp_score,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY fp_score DESC, doc_id) AS BIGINT) AS rank
               FROM per_doc)
    SELECT query_id, doc_id,
           CAST(fp_score AS DOUBLE) / 1000000.0 AS score, rank
    FROM ranked WHERE rank <= {_BM25_K}
    ORDER BY query_id, rank"""


@register(
    "text_bm25_topk",
    _bm25_sql(D.DUCK, "documents"),
    doc="training-data ext: BM25 (Okapi, Lucene positive IDF; k1=1.2 "
        "b=0.75) top-10 docs for 3 fixed term queries — curation-time "
        "term retrieval (decontamination lookups, relevance filtering) "
        "beside the embedding ANN family. Per-term score is "
        "ln(int-ratio)·int-ratio snapped to fixed-point micro-units, "
        "per-doc SUM exact-integer, so the oracle hash-matches; scoring "
        "touches only the query terms' postings via a broadcast "
        "semi-join, never the corpus (operators/search.py)",
    bench=True,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    # NO input repartition here, measured: BM25's per-row work (one
    # tokenize explode) is light enough that the extra exchange costs
    # more than the 1-partition scan does at bench SF (1.78 -> 2.98 s);
    # contrast text_bigram_logprob, whose position explode justifies it
    return bm25_topk(spark, docs, _BM25_QUERIES, k=_BM25_K).orderBy(
        "query_id", "rank"
    )


def _bigram_lm_sql(engine: str, table: str) -> str:
    toks_arr = D.split_ws("lower(trim(text))", engine)
    unnest = D.unnest_col("__t", engine)
    alen = D.alen("__t", engine)
    seq = D.iseq("1", f"greatest({alen} - 1, 1)", engine)
    pos = D.unnest_col(D.arr_filter(seq, f"i -> i + 1 <= {alen}", engine), engine)
    w1 = D.at("__t", "__i", engine)
    w2 = D.at("__t", "__i + 1", engine)
    return f"""
    WITH t AS (SELECT doc_id, {toks_arr} AS __t FROM {table}
               WHERE text IS NOT NULL),
    toks AS (SELECT doc_id, {unnest} AS tok FROM t),
    uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1 FROM toks GROUP BY tok),
    vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
    p AS (SELECT doc_id, __t, {pos} AS __i FROM t),
    bg AS (SELECT doc_id, {w1} AS w1, {w2} AS w2 FROM p),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM bg GROUP BY w1, w2),
    fp AS (SELECT bg.doc_id,
                  CAST(FLOOR(LN(CAST(c2.c2 + 1 AS DOUBLE)
                                / CAST(uni.c1 + vocab.v AS DOUBLE))
                             * 1000000.0 + 0.5) AS BIGINT) AS fp_log
           FROM bg JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
                   JOIN uni ON bg.w1 = uni.tok
                   CROSS JOIN vocab),
    per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                       SUM(fp_log) AS fp_sum
                FROM fp GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           CAST(fp_sum AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1000000.0)
             AS avg_logprob,
           fp_sum < -9000000 * n_bigrams AS low_quality
    FROM per_doc ORDER BY doc_id"""


@register(
    "text_bigram_logprob",
    _bigram_lm_sql(D.DUCK, "documents"),
    doc="training-data ext: bigram-LM quality score — avg conditional "
        "ln P(w_i|w_{i-1}) under the corpus's own add-one bigram model "
        "(penalizes improbable TOKEN ORDER where the unigram score "
        "can't); micro-nat fixed-point per bigram, exact-integer doc "
        "SUM, one final division (operators/text.py:"
        "bigram_logprob_features)",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_logprob_features

    docs = load_table(spark, sf_dir, "documents")
    # 16.4 -> 2.8 s at sf0.1: bigram-position explodes inherited the
    # 1-partition single-file scan layout (working-notes pitfall)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return bigram_logprob_features(docs, id_col="doc_id", col="text").orderBy(
        "doc_id"
    )


# ------------------------------------------------------ TF-IDF cosine

_TFIDF_TF_SQL_T = """
SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
FROM (SELECT doc_id, {unnest} AS tok FROM {table} WHERE text IS NOT NULL) t
GROUP BY doc_id, tok"""


def _tfidf_tf_sql(engine: str, table: str) -> str:
    unnest = D.unnest_col(D.split_ws("lower(trim(text))", engine), engine)
    return _TFIDF_TF_SQL_T.format(unnest=unnest, table=table)


def _tfidf_read_sql(tf_rel: str) -> str:
    """Cosine of tf·idf vectors over the bounded adjacent-id pair set.
    Weights are EXACT INTEGERS: tf · idf_milli where idf_milli =
    FLOOR((LN(N) − LN(df)) · 1e3 + 0.5) — LN only ever sees
    integer-valued doubles (the proven unigram-LM idiom), and the
    milli-unit scale keeps Σw² under 2^63 (micro-units would overflow
    at tf ≈ 54). Dot products and norms are exact BIGINT sums; the one
    float op is the final dot/√(na·nb), snapped to 1e-9. Engine-shared
    text for both engines."""
    return f"""
    WITH n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
               FROM {tf_rel}),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
              FROM {tf_rel} GROUP BY tok),
    w AS (
      SELECT t.doc_id, t.tok,
             t.tf * CAST(FLOOR((LN(CAST(n.nd AS DOUBLE))
                                - LN(CAST(dfreq.df AS DOUBLE)))
                               * 1000.0 + 0.5) AS BIGINT) AS w
      FROM {tf_rel} t
      JOIN dfreq ON dfreq.tok = t.tok
      CROSS JOIN n
    ),
    norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
              FROM w GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.w * b.w) AS BIGINT) AS dot,
             CAST(COUNT(*) AS BIGINT) AS shared_terms
      FROM w a JOIN w b ON b.tok = a.tok AND b.doc_id = a.doc_id + 1
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, shared_terms,
           CAST(FLOOR(CAST(dot AS DOUBLE)
                      / SQRT(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
                      * 1000000000.0 + 0.5) AS BIGINT)
             / CAST(1000000000 AS DOUBLE) AS cosine
    FROM dot
    JOIN norms na ON na.doc_id = doc_a
    JOIN norms nb ON nb.doc_id = doc_b
    ORDER BY doc_a"""


@register(
    "text_tfidf_cosine",
    "WITH tfq AS (" + _tfidf_tf_sql(D.DUCK, "documents") + "),"
    + _tfidf_read_sql("tfq").lstrip().removeprefix("WITH"),
    doc="training-data ext: vector-space TF-IDF cosine similarity on a "
        "bounded deterministic pair set (adjacent doc ids) — the "
        "classic-IR sibling of BM25 and the lexical complement of the "
        "embedding-cosine family. Weights are exact-integer tf·idf_milli "
        "(LN only sees integer-valued doubles — the unigram-LM idiom), "
        "dot/norms are exact BIGINT sums, one final float division "
        "snapped to 1e-9. Spark side materializes the one corpus "
        "tokenize pass into the small tf relation (CTE-inlining class); "
        "the scale path for UNBOUNDED pairs is LSH/ANN candidate "
        "generation feeding this exact scorer",
)
def text_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    docs.createOrReplaceTempView("bq_tfidf_docs")
    tf = spark.sql(_tfidf_tf_sql(D.SPARK, "bq_tfidf_docs")).localCheckpoint(
        eager=False
    )
    tf.createOrReplaceTempView("bq_tfidf_tf")
    return spark.sql(_tfidf_read_sql("bq_tfidf_tf"))
