"""ORC source/sink (columnar-format parity beyond the reference's
parquet-only surface — a user migrating a SQL workload often holds ORC
from a Hive/Trino estate).

Spark's native ORC reader gives the same scan-level machinery as
parquet: predicate pushdown into stripe/row-group skipping
(``PushedFilters`` in the plan), column pruning (``ReadSchema``), and
partition-directory pruning — asserted in tests/test_sources.py the
same way the parquet scans are pinned in tests/test_plans.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write a frame as ORC (zlib default codec), optionally
    directory-partitioned for partition pruning on read."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Scan an ORC table; filters/projections pushed down by Catalyst
    reach the stripe level exactly as with parquet."""
    return spark.read.orc(path)

