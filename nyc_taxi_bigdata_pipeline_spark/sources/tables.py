"""Readers for the driver-generated TPC-H-ish testdata (TESTDATA.md).

Reference parity: S2/S3 parquet scans
(``Ex01DataRetrieval.scala:82``, ``spark_io.py:71-135``) expressed as
plain ``spark.read.parquet`` so Catalyst gets pushdown/pruning for free.

The ``events`` table is stored with TIMESTAMP(NANOS) which Spark reads
as a raw long (``spark.sql.legacy.parquet.nanosAsLong``); we normalize
to microsecond TimestampType here so every downstream operator sees a
real timestamp column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_engine_confs

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; normalizes the events timestamp.

    The generator has written ``events.ts`` as TIMESTAMP(NANOS) (read as a
    raw long under ``nanosAsLong``) in some rounds and TIMESTAMP(MICROS)
    (read as TIMESTAMP_NTZ) in others — normalize BOTH to session-tz
    TimestampType so every downstream ``unix_micros``/window/watermark
    sees the same epoch-µs instants (session tz is pinned to UTC by
    ``ensure_engine_confs``, so NTZ wall-clock ≡ epoch semantics).
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns → µs; integer division keeps this exact and engine-agnostic
            df = df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register testdata tables as temp views for spark.sql() access."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
