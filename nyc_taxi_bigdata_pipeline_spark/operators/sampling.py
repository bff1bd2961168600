"""Deterministic sampling / dataset-split operators (scale path).

Training corpora are split and sampled by CONTENT-STABLE hashing, never
rand(): assignments must be reproducible across runs and survive
re-sharding, and a document's split must never depend on which partition
it landed in. xxhash64 is Spark's native 64-bit hash (codegen, no
shuffle needed to assign); the oracle-checked flavors in
``benchqueries/dataset_ops.py`` pin the same arithmetic via the
portable md5 hash.

At 100 TB these are all map-only column expressions — zero shuffles,
zero driver involvement; a filter on the split column pushes into the
scan pipeline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _bucket(key_col: str, seed: int, buckets: int) -> F.Column:
    """Stable [0, buckets) bucket from a seeded hash. pmod guards the
    sign: xxhash64 is full-range signed."""
    return F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)), F.lit(buckets))


def with_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    seed: int = 7,
) -> DataFrame:
    """Assign a deterministic split label from integer percentage weights
    (default 80/10/10 train/val/test). Map-only; re-running or
    re-sharding the corpus never moves a document between splits."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    total = sum(weights.values())
    b = _bucket(key_col, seed, total)
    expr = None
    acc = 0
    *head, (last_name, _) = weights.items()
    for name, w in head:
        acc += w
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 11
) -> DataFrame:
    """Hash-gated sample: keeps exactly the rows whose stable bucket
    falls under ``fraction`` (resolution 1/10000). Unlike df.sample(),
    the SAME rows survive across runs, engines, and repartitioning —
    what a reproducible data pipeline needs for debug slices and
    held-out subsets."""
    cut = int(round(fraction * 10_000))
    return df.filter(_bucket(key_col, seed, 10_000) < cut)


def per_key_exact_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: int = 17,
    order_hash: F.Column | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per stratum — the deterministic
    equivalent of per-key reservoir sampling. Rank rows inside each
    stratum by a seeded content hash (key as tiebreak) and keep the top
    ``k``; the chosen set is stable across runs, engines and
    repartitioning, and new rows displace old ones only by hash order.

    Scale shape: one shuffle on the stratum key + in-partition sort for
    the window. Stratum cardinality bounds the sort width; for heavily
    skewed strata the hash pre-filter trick (filter to ~4k/|stratum|
    by bucket first, then rank the survivors) keeps the sort bounded —
    apply it upstream with :func:`deterministic_sample` when a stratum
    exceeds memory.
    """
    from pyspark.sql import Window

    # default ranking hash is Spark-native xxhash64; pass ``order_hash``
    # (e.g. the portable md5-based h64) when the chosen set must be
    # reproducible OUTSIDE Spark as well
    h = order_hash
    if h is None:
        h = F.xxhash64(F.col(key_col).cast("string"), F.lit(seed))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col is None:
        return out.drop("__rn")
    # rank surfaced as INT (Spark row_number is int, DuckDB's BIGINT —
    # pin the narrow type for cross-engine schema parity)
    return out.withColumn(rank_col, F.col("__rn").cast("int")).drop("__rn")


def stratified_deterministic_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Per-stratum hash-gated sampling (e.g. downsample boilerplate-heavy
    length buckets, keep all rare long docs). Strata absent from
    ``fractions`` are dropped — matching sampleBy semantics."""
    b = _bucket(key_col, seed, 10_000)
    cond = None
    for stratum, frac in fractions.items():
        cut = int(round(frac * 10_000))
        c = (F.col(strata_col) == stratum) & (b < cut)
        cond = c if cond is None else (cond | c)
    return df.filter(cond if cond is not None else F.lit(False))
