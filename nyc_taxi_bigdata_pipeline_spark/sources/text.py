"""Raw-text corpus source (training-data ingestion): line- or
file-per-row reads over directories of .txt shards, the entry point a
corpus pipeline needs before dedup/curation see it as a documents
table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

def read_text_corpus(
    spark: SparkSession, path: str, whole_files: bool = False
) -> DataFrame:
    """Raw text ingestion for corpus building: one row per LINE
    (``(file, line_no, text)``) or per FILE (``(file, text)`` with
    ``whole_files`` — Spark's wholetext mode, one task per file).

    Line mode scales to any file size (splittable); whole-file mode is
    for document-per-file corpora where a file must stay one training
    document — files are the parallelism unit there, so shard many
    small files per directory rather than one giant file.

    ``line_no`` caveat: it is derived by ranking on
    ``monotonically_increasing_id()`` within each file, which encodes
    the PARTITION INDEX in its high bits — correct on a fresh scan
    because the text reader assigns split indexes in byte-offset order,
    but that ordering is an implementation detail, not a documented
    Spark guarantee. Treat ``line_no`` as scan-stable, not durable: if
    line numbers must survive reader/version changes, persist them at
    ingest (write this frame out) rather than re-deriving on re-read,
    or use whole-file mode and split lines yourself.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    reader = spark.read.format("text")
    if whole_files:
        df = reader.option("wholetext", "true").load(path)
        return df.select(
            F.input_file_name().alias("file"), F.col("value").alias("text")
        )
    df = reader.load(path).select(
        F.input_file_name().alias("file"), F.col("value").alias("text")
    )
    w = Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
    return df.withColumn("line_no", F.row_number().over(w)).select(
        "file", "line_no", "text"
    )
