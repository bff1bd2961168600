"""Sequence packing for training efficiency (concat-and-chunk).

GPT-style packing: concatenate a shard's token stream in a stable order
and cut it every ``context_len`` tokens. Each document's chunk is
derived from the running token offset with a per-shard window — no
driver loop, no UDF, and the window never sees more than one shard
(global-ORDER-BY windows collapse to a single partition; per-shard
windows are how packing scales to 100 TB — packing quality is a
per-shard property, so sharding costs nothing).

Deterministic end-to-end: shard = seeded hash of the id (content-stable,
like operators/sampling), order within shard = id. The oracle-checked
flavor is ``benchqueries/dataset_ops.dataset_pack_chunks``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def with_pack_chunks(
    df: DataFrame,
    token_col: str,
    context_len: int = 2048,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 13,
) -> DataFrame:
    """Adds ``shard``, ``start_offset`` (token offset of this doc within
    its shard's concatenated stream) and ``chunk`` (which context window
    the doc STARTS in). A doc may straddle a chunk boundary — that is the
    concat-and-chunk contract (documents are split, not padded)."""
    shard = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(n_shards))
    out = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("__cum", F.sum(token_col).over(w))
    out = out.withColumn(
        "start_offset", (F.col("__cum") - F.col(token_col)).cast("long")
    ).withColumn(
        "chunk", F.floor(F.col("start_offset") / F.lit(context_len)).cast("long")
    )
    return out.drop("__cum")


def pack_stats(
    df: DataFrame,
    token_col: str,
    context_len: int = 2048,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: int = 13,
) -> DataFrame:
    """Per-shard packing summary: docs, tokens, chunks started, and the
    max/avg docs landing in one chunk — the fill-balance numbers a
    training-data pipeline checks before writing packed shards."""
    packed = with_pack_chunks(df, token_col, context_len, id_col, n_shards, seed)
    per_chunk = packed.groupBy("shard", "chunk").agg(
        F.count("*").alias("docs_in_chunk"), F.sum(token_col).alias("chunk_tokens")
    )
    return per_chunk.groupBy("shard").agg(
        F.sum("docs_in_chunk").alias("docs"),
        F.sum("chunk_tokens").alias("total_tokens"),
        F.count("*").alias("chunks_started"),
        F.max("docs_in_chunk").alias("max_docs_per_chunk"),
        (F.sum("docs_in_chunk") / F.count("*")).alias("avg_docs_per_chunk"),
    )


def chunk_tokens_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """RAG-style document chunking: sliding token windows of ``window``
    tokens advancing by ``stride`` (overlap = window − stride), the
    retrieval-index sibling of concat-and-chunk packing. Each doc yields
    ``1 + ceil(max(n − window, 0) / stride)`` chunks; the final chunk is
    shorter rather than padded, and an empty doc still yields one empty
    chunk (chunkers must not silently drop rows).

    Scale shape: pure per-row JVM expressions — split once, explode a
    tiny chunk-id sequence, slice the staged token array. No shuffle at
    all; chunking rides the ingest scan. The token array is staged in
    ONE column so split() runs once per doc, not once per chunk
    expression (higher-order exprs are interpreted — CLAUDE.md).

    Spark's ``sequence(a, b)`` flips descending when a > b, so the chunk
    count is clamped with GREATEST; the clamp also absorbs the DIV
    truncate-vs-floor difference on negative numerators (n < window).
    """
    assert 0 < stride <= window, "stride must be in (0, window]"
    toks = F.split(F.trim(F.col(text_col)), " ")
    d = (
        df.select(id_col, toks.alias("__toks"))
        .withColumn("__n", F.size("__toks").cast("int"))
        .withColumn(
            "chunk_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.expr(f"CAST((__n - {window} + {stride} - 1) DIV {stride} AS INT)"),
                        F.lit(0),
                    ),
                )
            ),
        )
    )
    start = F.col("chunk_id") * stride + 1
    length = F.least(F.lit(window), F.col("__n") - F.col("chunk_id") * stride)
    return d.select(
        id_col,
        "chunk_id",
        start.cast("int").alias("tok_start"),
        length.cast("int").alias("tok_len"),
        F.array_join(F.slice("__toks", start, length), " ").alias("chunk_text"),
        F.col("__n").alias("n_tokens"),
    )
