"""Mergeable sketch primitives at the DataFrame level.

Same math, bit for bit, as the oracle-checked SQL twin in
``benchqueries/sketch_ops`` (portable md5-derived 60-bit hash, m=256
buckets, integer leading-zero rank, exact-integer harmonic-mean
denominator) — but exposed as composable DataFrame functions so the
STREAMING layer can maintain a sketch incrementally: registers merge by
MAX, which is exactly the ``max_cols`` case of
``operators/ivm.agg_view_merge``.

100-TB shape: a register table is ≤ m rows per group no matter the
input size, so per-shard sketches union for free (same GROUP BY, MAX),
a micro-batch merges into a materialized register view in O(|batch| +
|view|), and the estimate is a per-group rollup of ≤ m rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import compat as C

# CANONICAL sketch geometry — benchqueries/sketch_ops builds its
# dual-dialect SQL from these same values, so the DataFrame twin and
# the oracle-checked SQL twin cannot drift apart.
M = 256                    # HLL registers (8 bucket bits)
WBITS = 52                 # 60-bit hash minus 8 bucket bits
ALPHA = 0.7213 / (1.0 + 1.079 / M)
EMPTY_W = 1 << (WBITS + 1)
# backwards-compatible private aliases
_WBITS, _ALPHA, _EMPTY_W = WBITS, ALPHA, EMPTY_W


def rho_case(w: str) -> str:
    """Leading-zero rank of the 52-bit value ``w`` (1 = top bit set …
    53 = zero) as a pure integer CASE chain — no float log2, codegen.
    Engine-neutral SQL text (used by both the DataFrame twin and the
    dual-dialect oracle SQL)."""
    whens = " ".join(
        f"WHEN {w} >= {1 << (WBITS - k)} THEN {k}" for k in range(1, WBITS + 1)
    )
    return f"(CASE {whens} ELSE {WBITS + 1} END)"


_rho_case = rho_case


def hll_registers(df: DataFrame, keys: Sequence[str], id_col: str) -> DataFrame:
    """Per-(keys, bucket) MAX-rho HLL registers for ``id_col``.

    One hash aggregate with map-side combine; the output is ≤ m rows
    per key group at any input size. Registers from different shards /
    batches / partitions merge with another MAX over the same keys.
    """
    keys = list(keys)
    h = C.h64_spark(f"CAST({id_col} AS STRING)")
    rows = df.select(
        *keys,
        F.expr(f"{h} % {M}").alias("bucket"),
        F.expr(_rho_case(f"({h} DIV {M})")).alias("rho"),
    )
    return rows.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Distinct-count estimate per key group from a register table.

    Exact-integer harmonic denominator (empty registers contribute
    2^53); the only float ops are one constant multiply and one divide,
    plus the linear-counting LN on the small-range branch — identical
    IEEE results in any engine or partition order.
    """
    keys = list(keys)
    per = registers.groupBy(*keys).agg(
        F.count("*").alias("used"),
        F.expr(f"CAST(SUM(shiftleft(CAST(1 AS BIGINT), {_WBITS + 1} - rho))"
               " AS BIGINT)").alias("sum_present"),
    )
    raw = (f"(CAST({_ALPHA!r} AS DOUBLE) * CAST({float(M * M)!r} AS DOUBLE)"
           f" * CAST({float(_EMPTY_W)!r} AS DOUBLE) / CAST(reg_sum AS DOUBLE))")
    return (
        per.withColumn(
            "reg_sum",
            F.expr(f"CAST(sum_present + ({M} - used) * {_EMPTY_W} AS BIGINT)"),
        )
        .select(
            *keys,
            F.expr(
                f"ROUND(CASE WHEN {raw} <= CAST({2.5 * M!r} AS DOUBLE)"
                f" AND used < {M}"
                f" THEN CAST({float(M)!r} AS DOUBLE)"
                f"      * LN(CAST({float(M)!r} AS DOUBLE)"
                f"           / CAST({M} - used AS DOUBLE))"
                f" ELSE {raw} END, 4)"
            ).alias("hll_estimate"),
        )
    )


CMS_D = 4    # hash rows
CMS_W = 512  # counters per row


def cms_counter_rows(df: DataFrame, token_col: str) -> DataFrame:
    """Count-Min counter increments for a token column: one row per
    (seed, bucket) with its count — same portable hash and d×w geometry
    as the oracle-checked SQL twin (benchqueries/sketch_ops._cms_sql).

    Counters merge by SUM, so a streaming CMS is just
    ``streaming/sinks.foreach_batch_agg_maintain(cms_hash_rows(stream),
    keys=["seed", "bucket"], sum_cols=["c"])`` — the row-level
    projection is streaming-safe (no pre-aggregation; the sink sums per
    micro-batch). Unlike the HLL's idempotent MAX, SUM counts every
    delivery, so feed it effectively-once input
    (dedup_within_watermark upstream).
    """
    return (
        cms_hash_rows(df, token_col)
        .groupBy("seed", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def cms_hash_rows(df: DataFrame, token_col: str) -> DataFrame:
    """Row-level (seed, bucket, c=1) projection — works on streams
    (pure narrow transforms, aggregation deferred to the consumer)."""
    seeded = df.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("seed"),
    )
    h = C.h64_spark("CONCAT(CAST(seed AS STRING), '#', tok)")
    return seeded.select(
        "seed",
        F.expr(f"{h} % {CMS_W}").alias("bucket"),
        F.lit(1).cast("bigint").alias("c"),
    )


def cms_lookup(counters: DataFrame, probes: DataFrame, token_col: str) -> DataFrame:
    """Point-estimate probe: MIN over the d counters a token hashes to —
    the CMS read path (estimate ≥ true count, one-sided error)."""
    seeded = probes.select(
        F.col(token_col).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("seed"),
    )
    h = C.h64_spark("CONCAT(CAST(seed AS STRING), '#', tok)")
    keyed = seeded.select("tok", "seed", F.expr(f"{h} % {CMS_W}").alias("bucket"))
    return (
        keyed.join(counters, ["seed", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("cms_estimate"))
    )


HDR_SUB = 16        # HDR histogram: linear sub-bins per power of two
HDR_MAXBITS = 40    # price-in-cents fits well below 2^40


def flog2_case(v: str) -> str:
    """floor(log2(v)) for 16 ≤ v < 2^40 as a pure integer CASE chain —
    no float LOG2 (misrounds at power-of-two boundaries). Engine-neutral
    SQL text shared with benchqueries/sketch_ops."""
    whens = " ".join(
        f"WHEN {v} >= {1 << k} THEN {k}" for k in range(HDR_MAXBITS, 3, -1)
    )
    return f"(CASE {whens} ELSE 3 END)"


def hdr_bin_rows(df: DataFrame, value_col: str) -> DataFrame:
    """Row-level (bin_id, c=1) projection of a money column onto the
    log-linear HDR grid — streaming-safe (pure narrow transforms), the
    quantile-sketch sibling of :func:`cms_hash_rows`. Bin counts merge
    by SUM, so a streaming quantile sketch is this plus
    ``streaming/sinks.foreach_batch_agg_maintain(..., keys=["bin_id"],
    sum_cols=["c"])``; read quantiles back with the cumulative-walk SQL
    (benchqueries/sketch_ops._hdr_read_sql) over the maintained view."""
    v = f"CAST(CAST({value_col} AS DECIMAL(18,6)) * 100 AS BIGINT)"
    b = flog2_case("v")
    return (
        df.filter(F.expr(f"{value_col} > 0"))
        .select(F.expr(v).alias("v"))
        .filter(F.col("v") >= 16)
        .select(
            F.expr(
                f"CAST({b} * {HDR_SUB}"
                f" + ((v - shiftleft(CAST(1 AS BIGINT), {b})) * {HDR_SUB})"
                f"   DIV shiftleft(CAST(1 AS BIGINT), {b}) AS BIGINT)"
            ).alias("bin_id"),
            F.lit(1).cast("bigint").alias("c"),
        )
    )
