"""JSON-lines source/sink (S7/S11 extension).

The reference's JSON handling is driver-side artifacts only
(``trainer.py:310-338``); the engine additionally exposes distributed
JSONL as a real table format — the interchange format training-data
pipelines actually move corpora in. Reads demand an explicit schema:
schema inference costs a full extra pass over 100 TB and silently
drifts when a field is absent from the sampled partition.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import ensure_engine_confs


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = "_corrupt_record",
) -> DataFrame:
    """Distributed JSONL scan with a REQUIRED schema.

    ``mode`` follows Spark's JSON parser: PERMISSIVE (malformed rows →
    nulls, captured in ``corrupt_col`` when named in the schema),
    DROPMALFORMED, or FAILFAST. The parser runs JVM-side per input
    split — parallelism tracks file splits exactly like parquet."""
    ensure_engine_confs(spark)
    reader = spark.read.schema(schema).option("mode", mode)
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Write a frame as JSONL shards (one file per partition — size
    shards via ``partitions`` so downstream consumers get even files)."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").json(path)


def documents_jsonl_roundtrip_schema() -> StructType:
    """Schema for the documents table as a JSONL corpus."""
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
