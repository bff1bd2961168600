"""Table maintenance operators (100 TB housekeeping).

- small-file compaction: monthly partition-overwrite ingestion leaves
  whatever file count the write parallelism produced; readers want
  ~128 MB files. Compaction rewrites a partition to a computed file
  count — same dynamic-partition-overwrite idempotency as ingest.
- sorted writes: sortWithinPartitions before writing lays rows out so
  parquet row-group min/max stats become selective (the poor man's
  Z-order for a single dominant predicate column).
- incremental rollup maintenance: a daily aggregate table appended
  month-by-month — the materialized-view pattern that replaces
  recomputing dashboards over the full fact table.
"""

from __future__ import annotations

import math
import shutil
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_size_bytes(path: str) -> int:
    return sum(p.stat().st_size for p in Path(path).rglob("*.parquet"))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory to ceil(size/target) files; returns
    the new file count.

    Writes to a temporary sibling directory first, then swaps — never
    overwrite the directory being read: a persist()+count() barrier only
    protects until a cached partition is evicted or an executor dies,
    after which Spark recomputes from the half-deleted source. The swap
    keeps the old data on disk until the new copy is fully written, so a
    mid-write crash loses nothing. (On an object store / lakehouse the
    equivalent is a table-format commit, e.g. Iceberg rewrite_data_files.)
    """
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(partition_size_bytes(path) / target_file_bytes))
    df = df.repartition(n_files)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__precompact"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    Path(path).rename(old)
    Path(tmp).rename(path)
    shutil.rmtree(old)
    return n_files


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int | None = None
) -> None:
    """Write with rows clustered on ``sort_cols`` so parquet row-group
    min/max statistics prune reads on those predicates. For multi-column
    locality beyond one dominant column, range-partition on the leading
    column first (repartitionByRange) — done here."""
    out = df.repartitionByRange(n_files or 8, *[F.col(c) for c in sort_cols])
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def update_daily_rollup(
    fact_month: DataFrame,
    rollup_path: str,
    date_col: str = "pickup_date",
    amount_col: str = "total_amount",
) -> None:
    """Incremental maintenance of a daily rollup table: aggregate ONLY
    the new month's fact rows and dynamically overwrite that month's
    rollup partition — history is never recomputed, and re-running a
    month REPLACES its slice instead of double-counting it."""
    agg = (
        fact_month.groupBy(date_col)
        .agg(F.count("*").alias("trips"), F.sum(amount_col).alias("revenue"))
        .withColumn("src_month", F.date_format(F.col(date_col), "yyyy-MM"))
    )
    (
        agg.repartition("src_month")
        .write.mode("overwrite")
        .partitionBy("src_month")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(rollup_path)
    )


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path).select(
        F.col("pickup_date"), "trips", "revenue"
    )


def zorder_value(col_a: str, col_b: str, bits: int = 16) -> F.Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns so rows close in BOTH dimensions get
    close keys. Pure bit arithmetic — whole-stage codegen, no UDF.

    Both inputs MUST already be normalized to the full [0, 2^bits)
    range (write_zordered does min-max scaling): interleaving raw values
    of different magnitudes lets the wider dimension own every high bit
    and the curve degenerates to a plain sort on it — the narrow
    dimension then gets no file-level clustering at all.
    """
    mask = (1 << bits) - 1
    a, b = f"({col_a} & {mask})", f"({col_b} & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"(shiftleft(shiftright({a}, {i}) & 1, {2 * i}))")
        terms.append(f"(shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1}))")
    return F.expr(" | ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write parquet clustered on the Z-order curve of two columns, so
    row-group/file min-max statistics prune scans filtered on EITHER
    column (write_sorted only skips on its leading column). The curve
    key is kept in the file as ``zorder_key`` — harmless, and it makes
    the clustering auditable.

    A stats pass min-max scales each dimension to the full ``bits``
    width first (at warehouse scale, derive the bounds from a sample or
    table metadata instead of an exact agg — rank precision beyond file
    granularity is wasted). Then range-partition on the key (contiguous
    curve segments per file) and sort inside each file: every file
    covers a compact rectangle-ish region of (a, b) space — the layout
    Delta/Iceberg OPTIMIZE ZORDER produces, from two plain Spark
    primitives.
    """
    n_rows, lo_a, hi_a, lo_b, hi_b = df.agg(
        F.count("*"), F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if n_rows == 0:  # empty input: write it, key = 0
        df.withColumn("zorder_key", F.lit(0).cast("bigint")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        return
    if lo_a is None or lo_b is None:
        # a non-empty table with an all-NULL key would otherwise funnel
        # every row through the single-file empty path — refuse instead
        raise ValueError(
            f"z-order key column {col_a if lo_a is None else col_b!r} is "
            "entirely NULL; pick populated clustering columns"
        )
    mask = (1 << bits) - 1

    def norm(col: str, lo: int, hi: int) -> str:
        # multiply-then-divide keeps full precision, but (col-lo)*mask
        # overflows BIGINT for wide-range keys (epoch-µs spans); switch
        # to pre-division ((col-lo) DIV step) when the product could
        # exceed 2^62 — rank precision beyond file granularity is wasted
        # anyway, so the coarser bucketing loses nothing that matters.
        span = max(1, hi - lo)
        if span <= (1 << 62) // mask:
            return f"((({col} - {lo}) * {mask}) DIV {span})"
        step = -(-span // mask)  # ceil: keeps the result within [0, mask]
        return f"(LEAST(({col} - {lo}) DIV {step}, {mask}))"

    norm_a = norm(col_a, lo_a, hi_a)
    norm_b = norm(col_b, lo_b, hi_b)
    keyed = df.withColumn("zorder_key", zorder_value(norm_a, norm_b, bits))
    (
        keyed.repartitionByRange(n_files, "zorder_key")
        .sortWithinPartitions("zorder_key")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a Hive-bucketed (and bucket-sorted) table on
    ``bucket_col`` — the co-located-join layout the 100-TB brief calls
    for: two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle (each bucket file pair sort-merges directly),
    and with ``sort`` the per-bucket sort is pre-paid at write time too.

    That turns the fact⋈fact / fact⋈big-dim joins that dominate
    warehouse maintenance (CDC merge, SCD2 close, dedup-by-key) from
    one full exchange PER RUN into zero — the shuffle is amortized into
    the single bucketed write. Requires ``saveAsTable`` (bucketing
    metadata lives in the catalog, not the parquet footers); pass
    ``path`` to keep the data external to the warehouse dir.

    Pick ``n_buckets`` so each bucket lands near one HDFS-block-ish
    file: rows_per_bucket ≈ |df| / n_buckets, target ~128 MB. Bucket
    counts must MATCH across tables meant to co-join (Spark does not
    coalesce mismatched bucket counts by default).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def joins_without_shuffle(a: DataFrame, b: DataFrame, on: str) -> bool:
    """True when an equi-join of ``a`` ⋈ ``b`` on ``on`` plans with NO
    shuffle exchange — the co-location check for bucketed layouts
    (broadcast joins are excluded first so a small test fixture can't
    vacuously pass via a broadcast plan)."""
    from ..plans.explain import physical_plan

    joined = a.hint("merge").join(b, on)
    # simple mode: formatted mode splits the node name and its
    # hashpartitioning arguments across lines, so a substring check
    # there can NEVER match (false "no shuffle")
    plan = physical_plan(joined, "simple")
    return "Exchange hashpartitioning" not in plan
