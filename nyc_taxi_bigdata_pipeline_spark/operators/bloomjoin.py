"""Bloom-prefiltered joins: shrink the big side BEFORE it shuffles.

The 100-TB join problem the optimizer's static planning can't always
see: ``fact JOIN filtered_dim`` where the filtered dim keeps few keys —
the fact side still shuffles EVERY row, then the join throws most away.
Spark's own runtime bloom filter (InjectRuntimeFilter) covers some
shapes; this operator makes the pattern explicit and composable:

1. hash the key side's keys k ways into an m-bit space and keep the
   DISTINCT set positions (≤ m rows, kilobytes — the Bloom filter as a
   relation);
2. probe the big side with k BROADCAST left-semi joins, one per hash —
   a row survives only if every one of its k positions is set. Broadcast
   hash semi-joins are narrow: the big side never exchanges, so the
   pre-filter costs k in-memory probes per row and ZERO shuffle.

No false negatives by construction (every true match survives), so
``bloom_prefilter(big) ⋈ keys ≡ big ⋈ keys`` always; false positives
only waste a little post-filter work in the real join. xxhash64 over
the RAW key column (never a string cast — measured 1.75× of the whole
query) is fine here: this is engine-internal pruning, not an oracle
surface (the oracle-checked Bloom arithmetic lives in
benchqueries/sketch_ops).

Measured regime (RESULTS.md, 6M-row big side, 301k keys, local[32],
broadcast disabled): the prefilter cuts rows-reaching-the-shuffle to
25% for ~8% wall overhead on a machine where shuffle is memory-speed —
i.e. it roughly breaks even with NO network; on a cluster the 4×
shuffle-volume cut is the win. When the key side is small enough to
broadcast outright, skip this (a plain broadcast join measured 3×
faster) — and check Spark's own
``spark.sql.optimizer.runtime.bloomFilter.enabled`` first, which
covers the common shapes without any code.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_BITS = 1 << 20  # 128 KiB of positions at worst; fp ≈ (n/m)^k shape


def bloom_bitsets(
    keys: DataFrame, on: str, m: int = DEFAULT_BITS, k: int = 2
) -> list[DataFrame]:
    """One DISTINCT set-position relation per hash seed (each ≤ m rows)."""
    out = []
    for seed in range(k):
        pos = F.pmod(F.xxhash64(F.col(on), F.lit(seed)), F.lit(m))
        out.append(keys.select(pos.alias("__pos")).distinct())
    return out


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    m: int = DEFAULT_BITS,
    k: int = 2,
) -> DataFrame:
    """Rows of ``big`` whose ``on`` key is POSSIBLY in ``keys`` — a
    guaranteed superset of the true semi-join, computed with broadcast
    probes only (the big side never shuffles). Chain before an expensive
    join/aggregate so the shuffle sees survivors, not the full table."""
    out = big
    for seed, bits in enumerate(bloom_bitsets(keys, on, m, k)):
        pos = F.pmod(F.xxhash64(F.col(on), F.lit(seed)), F.lit(m))
        out = out.join(F.broadcast(bits), pos == F.col("__pos"), "left_semi")
    return out
