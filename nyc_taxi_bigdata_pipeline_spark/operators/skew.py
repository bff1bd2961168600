"""Skew-aware aggregation patterns (100 TB discipline).

What Spark already gives you, so you don't hand-roll it:
- count/sum/min/max group-bys do map-side partial aggregation — a hot
  key is pre-collapsed per task before the shuffle, so key skew rarely
  hurts plain aggregates;
- join skew is split at runtime by AQE (skewJoin on in session.py).

What still needs explicit structure:
- COUNT(DISTINCT x) over skewed groups: Spark expands distinct aggs into
  a per-(group, x) aggregate first, but when ONE group dominates, the
  second stage still funnels that group through one task — two-stage
  salting fixes the first shuffle's balance;
- order-sensitive/holistic aggs (collect_list, exact percentiles).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_salt(df: DataFrame, buckets: int = 16, col: str = "__salt") -> DataFrame:
    """Random salt column in [0, buckets). Uses a hash of the whole row
    via monotonically_increasing_id-free spark_partition_id+rand-free
    deterministic path: xxhash64 over all columns, so re-runs salt
    identically (no rand() → plans stay deterministic)."""
    return df.withColumn(col, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)))


def salted_count_distinct(
    df: DataFrame, group_cols: Sequence[str], distinct_col: str, buckets: int = 16
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) per group, skew-balanced:
    stage 1 groups by (group, salt(distinct_value)) collecting partial
    distinct counts of the value space; stage 2 sums partials. The hot
    group's first shuffle spreads over ``buckets`` tasks.

    Equivalent to ``df.groupBy(g).agg(countDistinct(c))`` (tested), but
    the heavy shuffle is balanced when one group dominates.
    """
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)))
    partial = (
        salted.groupBy(*group_cols, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__part"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("__part").alias(f"distinct_{distinct_col}"))


def salted_collect_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    per_group_limit: int,
    buckets: int = 16,
) -> DataFrame:
    """Bounded per-group value sample for holistic downstream work:
    per-(group, salt) local head via window, then per-group head — no
    single task ever materializes a whole hot group."""
    from pyspark.sql import Window

    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(value_col)
    local = (
        salted.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= per_group_limit)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(value_col)
    return (
        local.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= per_group_limit)
        .drop("__rn")
    )
