"""Monthly orchestration (ex06 parity): run_month = ingest → warehouse →
quality gates → (ML when eligible), with backfill as a driver-side loop.

The Airflow DAG's task graph (full_pipeline_dag.py:82-594) collapses
into one function per month; SLAs/retries belong to whatever scheduler
invokes this, the data logic lives here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import ingest, quality, warehouse
from .functions.datetime_parity import sliding_months
from .sources.fs import hadoop_path_exists
from .ml.features import build_feature_table
from .ml.registry import ModelRegistry
from .ml.train import TrainResult, train_and_evaluate


@dataclass
class MonthRunResult:
    year: int
    month: int
    counts: dict[str, int] = field(default_factory=dict)
    checks: list[quality.CheckResult] = field(default_factory=list)
    ml: TrainResult | None = None
    ml_decision: str | None = None

    @property
    def ok(self) -> bool:
        return all(c.ok for c in self.checks)


def run_month(
    spark: SparkSession,
    raw_df: DataFrame,
    zone_lookup: DataFrame,
    silver_path: str,
    gold_path: str,
    year: int,
    month: int,
    min_rows: int = quality.MIN_ROWCOUNT,
) -> MonthRunResult:
    """EX01→EX03 for one month: clean, write silver partition, build/extend
    the star schema with the idempotent fact load, evaluate gates."""
    res = MonthRunResult(year, month)

    counts = ingest.ingest_month(spark, raw_df, silver_path, year, month)
    res.counts.update(counts)
    res.checks.append(
        quality.retention_check(counts["rows_in"], counts["rows_out"], "ingest")
    )
    res.checks.append(quality.min_rowcount_check(counts["rows_out"], "silver", min_rows))

    clean = ingest.read_silver(spark, silver_path, [(year, month)])
    fact_incoming = warehouse.build_fact(clean)

    fact_path = str(Path(gold_path) / "fact_trip")
    # S4 Hadoop FS probe (not os.path): works on HDFS/S3A, not just the
    # driver's local disk
    existing = None
    if hadoop_path_exists(spark, fact_path):
        existing = spark.read.parquet(fact_path)
    new_rows = warehouse.load_fact_idempotent(fact_incoming, existing)
    new_rows.write.mode("append").parquet(fact_path)

    fact = spark.read.parquet(fact_path)
    res.counts["fact_rows"] = fact.count()
    res.checks.append(quality.min_rowcount_check(res.counts["fact_rows"], "fact", min_rows))

    # dims are rebuilt from THIS month's clean data, then merged
    # insert-if-absent with the existing gold dim — keys observed only in
    # earlier months ('Unknown' location ids, prior dates) must survive
    # the rebuild or prior facts vanish from inner-join analytics.
    # Mirrors dw_load_incremental.sql's insert-if-absent and stays
    # O(month + dim), never a scan of the full fact history.
    dims = warehouse.seed_enum_dims(spark)
    dims["dim_location"] = _merge_existing_dim(
        spark, warehouse.build_dim_location(zone_lookup, clean),
        str(Path(gold_path) / "dim_location"), "location_id",
    )
    dims["dim_date"] = _merge_existing_dim(
        spark, warehouse.build_dim_date(clean),
        str(Path(gold_path) / "dim_date"), "date_id",
    )
    dims["dim_time"] = warehouse.build_dim_time(spark)
    for name, df in dims.items():
        df.write.mode("overwrite").parquet(str(Path(gold_path) / name))
    return res


def _merge_existing_dim(
    spark: SparkSession, new_dim: DataFrame, path: str, key: str
) -> DataFrame:
    """Insert-if-absent dim merge: carry forward existing dim rows whose
    key the new build didn't observe. The carried rows are collected
    (dims are bounded by design — zone count / calendar days), which
    also breaks the read-from-path → overwrite-same-path cycle."""
    if not hadoop_path_exists(spark, path):
        return new_dim
    old = spark.read.parquet(path)
    carried = old.join(new_dim.select(key), [key], "left_anti").collect()
    if not carried:
        return new_dim
    return new_dim.unionByName(spark.createDataFrame(carried, old.schema))


def backfill(
    spark: SparkSession,
    month_frames: list[tuple[int, int, DataFrame]],
    zone_lookup: DataFrame,
    silver_path: str,
    gold_path: str,
    min_rows: int = quality.MIN_ROWCOUNT,
    stop_on_fail: bool = True,
) -> list[MonthRunResult]:
    """Q7 backfill contract: months processed strictly in order, one at a
    time (max_active_runs=1 semantics), halting on a FAILed gate unless
    told otherwise (full_pipeline_dag.py:82-94)."""
    results: list[MonthRunResult] = []
    for year, month, raw in sorted(month_frames, key=lambda t: (t[0], t[1])):
        res = run_month(
            spark, raw, zone_lookup, silver_path, gold_path, year, month, min_rows
        )
        results.append(res)
        if stop_on_fail and not res.ok:
            break
    return results


def run_ml_month(
    spark: SparkSession,
    silver_path: str,
    registry_root: str,
    year: int,
    month: int,
) -> tuple[TrainResult | None, str | None, list[quality.CheckResult]]:
    """EX05 for one month: sliding 3-month training window, test on the
    target month, register + promote-or-discard (Q4/Q5 gating)."""
    window = sliding_months(year, month, quality.ML_WINDOW_MONTHS)
    silver = ingest.read_silver(spark, silver_path)
    months_present = {
        (r["year"], r["month"])
        for r in silver.select("year", "month").distinct().collect()
    }
    train_months = [m for m in window if m in months_present]
    checks = [quality.ml_eligibility_check(len(train_months))]
    if (year, month) not in months_present:
        checks.append(quality.CheckResult("ml_test_month", "FAIL", f"{year}-{month} missing"))
    if not all(c.ok for c in checks):
        return None, None, checks

    train_df = build_feature_table(ingest.read_silver(spark, silver_path, train_months))
    test_df = build_feature_table(ingest.read_silver(spark, silver_path, [(year, month)]))
    checks.append(quality.schema_check(train_df, "train"))
    if not checks[-1].ok:
        return None, None, checks

    result = train_and_evaluate(train_df, test_df)
    reg = ModelRegistry(registry_root)
    tag = f"{year}-{month:02d}"
    reg.register_candidate(result.model, result.metrics, tag)
    decision = reg.promote_or_discard(result.metrics, tag)
    return result, decision, checks
