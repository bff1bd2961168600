"""JDBC source/sink (S6/S7 parity — optional path).

The engine's primary design REPLACES the reference's Postgres warehouse
with gold Spark tables (SURVEY §0 'key insight'): no JDBC hop, no
row-oriented transit, Catalyst instead of the Postgres planner. These
wrappers exist for deployments that still need to exchange data with an
RDBMS; they reproduce the reference's exact write semantics
(``Ex02DataIngestion.scala:154-164``: overwrite + truncate) plus the
scale knobs the reference leaves at defaults.

Exercised end-to-end against the Derby embedded driver on Spark's own
classpath (tests/test_sources.py::test_jdbc_roundtrip_embedded_derby):
truncate+overwrite write, then a predicate-partitioned read sharded
into range queries — no external database required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def write_jdbc_overwrite(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
    truncate: bool = True,
) -> None:
    """S6: truncate+overwrite load (keeps the target's DDL/indexes, the
    reason the reference sets truncate=true). Executors open one
    connection per partition — repartition to the connection budget the
    target DB tolerates before calling."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
        .option("batchsize", str(batch_size))
        .options(**(properties or {}))
        .mode("overwrite")
        .save()
    )


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int = 8,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S7: parallel JDBC read — without partitioning bounds Spark reads
    through ONE connection; these options shard the table into
    ``num_partitions`` range queries."""
    reader: DataFrameReader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .options(**(properties or {}))
    )
    return reader.load()
