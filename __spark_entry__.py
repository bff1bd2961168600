"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``nyc_taxi_bigdata_pipeline_spark.benchqueries`` — the
oracle-checked query registry covering SURVEY.md §2 plus the
training-data-pipeline extensions (dedup / similarity / text ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY  # noqa: E402
from nyc_taxi_bigdata_pipeline_spark.session import ensure_engine_confs  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    ensure_engine_confs(spark)
    return REGISTRY["pricing_summary"].spark_fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: q.spark_fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
