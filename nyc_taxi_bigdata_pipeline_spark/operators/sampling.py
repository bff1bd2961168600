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
    prefilter: bool = True,
    oversample: int = 16,
    hash_range: tuple[int, int] = (-(1 << 63), (1 << 63) - 1),
) -> DataFrame:
    """EXACTLY min(k, group size) rows per stratum — the deterministic
    equivalent of per-key reservoir sampling. Rank rows inside each
    stratum by a seeded content hash (key as tiebreak) and keep the top
    ``k``; the chosen set is stable across runs, engines and
    repartitioning, and new rows displace old ones only by hash order.

    Scale shape: the naive window-over-stratum shuffles and sorts the
    ENTIRE table to emit k·|strata| rows (measured 30 s on 15M rows /
    5 strata; a salted two-phase top-k was tried and is ~20% WORSE —
    same 15M-row shuffle plus a second exchange). The winning shape
    cuts the shuffle itself: rank-by-hash means the winners live in the
    LOW END of the hash range, so (1) count each stratum (tiny agg),
    (2) keep only rows whose hash falls in the lowest
    ``oversample·k/count`` slice of ``hash_range`` — a map-side filter
    that kills ~99% of the shuffle at these sizes, (3) window the
    survivors. Exactness is NOT probabilistic: a per-stratum survivor
    count ≥ min(k, count) is verified, with automatic fallback to the
    unfiltered window on deficit (P ≈ binomial tail at 16× oversample,
    but the guard makes the result unconditional). Measured 30.7 s →
    6.6 s (~5×) at 15M rows / 5 strata / k=1000; identity with the
    naive plan is pinned by test_per_key_sample_prefilter_exact.

    ``hash_range`` must match ``order_hash``'s output range when one is
    passed (e.g. ``(0, 1 << 60)`` for the portable md5 h64); the
    default matches xxhash64. Strata cardinality must fit the driver
    (two |strata|-row collects) — for millions of strata fall back to
    ``prefilter=False``.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    # default ranking hash is Spark-native xxhash64; pass ``order_hash``
    # (e.g. the portable md5-based h64) when the chosen set must be
    # reproducible OUTSIDE Spark as well
    h = order_hash
    if h is None:
        h = F.xxhash64(F.col(key_col).cast("string"), F.lit(seed))
    staged = df.withColumn("__h", h)

    if prefilter:
        lo, hi = hash_range
        span = hi - lo
        counts = staged.groupBy(strata_col).agg(F.count("*").alias("__n")).collect()
        cut_rows = []
        for r in counts:
            n = r["__n"]
            frac = min(1.0, (oversample * k) / max(1, n))
            # clamp: float(span) rounds up past 2^64 and would overflow
            cut_rows.append((r[strata_col], min(hi, lo + int(frac * span))))
        spark = df.sparkSession
        sch = StructType(
            [df.select(strata_col).schema.fields[0], StructField("__cut", LongType())]
        )
        cuts = spark.createDataFrame(cut_rows, sch)
        # the survivor frame is read twice — the exactness-guard count
        # below and the final window — and is tiny (≈ oversample·k·|strata|
        # rows), while recomputing it costs a full scan + the ranking
        # hash. Lazy checkpoint: the guard count materializes it (inside
        # the operator's own timing), the window then reads the blocks.
        filtered = (
            staged.join(F.broadcast(cuts), strata_col)
            .filter(F.col("__h") <= F.col("__cut"))
            .drop("__cut")
            .localCheckpoint(eager=False)
        )
        need = {r[strata_col]: min(k, r["__n"]) for r in counts}
        got = {
            r[strata_col]: r["__n"]
            for r in filtered.groupBy(strata_col).agg(F.count("*").alias("__n")).collect()
        }
        if all(got.get(s, 0) >= n for s, n in need.items()):
            staged = filtered
        # else: astronomically unlikely hash clustering — keep the full
        # table and let the plain window guarantee correctness

    w = Window.partitionBy(strata_col).orderBy("__h", key_col)
    out = (
        staged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__h")
    )
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


def weighted_deterministic_sample(
    df: DataFrame,
    weight_col: str,
    target_fraction: float,
    key_col: str = "doc_id",
    max_weight: int = 1 << 20,
    seed: int = 23,
) -> DataFrame:
    """Importance sampling with content-stable selection: each row's
    keep-probability is proportional to its integer ``weight_col``
    (e.g. token count — sampling documents proportional to length keeps
    the TOKEN budget's composition, where uniform doc sampling skews it
    toward short docs). ``target_fraction`` rescales so the expected
    kept-weight fraction matches; rows with rescaled weight ≥ max_weight
    are always kept (deterministic heavy-item guarantee, the same
    always-include rule threshold-sampling/VarOpt uses).

    keep ⇔ hash(key) mod max_weight < weight · target_fraction · C —
    pure integer comparison, map-only, zero shuffle; reproducible
    across runs/engines/re-sharding like every sampler in this module.
    C folds target_fraction against the MEAN weight so the expected
    kept fraction of total weight ≈ target_fraction when weights vary.
    """
    mean_w = df.agg(F.avg(weight_col)).first()[0] or 1.0
    # per-row threshold: w * target_fraction / mean_w of the hash space
    scale = target_fraction / float(mean_w)
    gate = F.pmod(
        F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)), F.lit(max_weight)
    )
    thresh = (F.col(weight_col).cast("double") * scale * max_weight).cast("bigint")
    return df.filter(gate < F.least(thresh, F.lit(max_weight)))
