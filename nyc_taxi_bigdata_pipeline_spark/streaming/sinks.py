"""Streaming sinks and enrichment (extension over SURVEY §2.9).

- stream-static enrichment: a streaming fact joined to broadcast-sized
  static dims — the streaming twin of the analytics layer's star joins.
- ``dedup_within_watermark``: drop duplicate event_ids arriving within
  the watermark horizon (bounded state), the streaming analogue of the
  warehouse's anti-dup insert.
- ``foreach_batch_upsert``: idempotent micro-batch append into a
  parquet gold table using the same left-anti natural-key strategy as
  the batch warehouse (operators/upsert.py) — exactly-once-per-key
  semantics on top of at-least-once delivery.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast
from pyspark.sql.streaming import StreamingQuery

from ..operators.upsert import anti_dup_append


def enrich_stream(events: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (small)
    static dims; Spark re-plans the broadcast per batch, so dim updates
    between batches are picked up automatically."""
    out = events
    for _, dim in dims.items():
        key = dim.columns[0]
        out = out.join(broadcast(dim), key, "left")
    return out


def dedup_within_watermark(events: DataFrame, key: str = "event_id",
                           watermark: str = "1 hour") -> DataFrame:
    """At-least-once → effectively-once on ``key`` within the watermark
    horizon; state for keys older than the watermark is dropped, so
    memory is bounded by arrival rate × horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([key])


def foreach_batch_upsert(
    stream: DataFrame,
    gold_path: str,
    natural_key: Sequence[str],
    checkpoint: str,
) -> StreamingQuery:
    """Write a stream into a parquet gold table idempotently: every
    micro-batch is left-anti-joined against the current table on the
    natural key before appending — re-delivered batches (failure/retry)
    insert nothing the second time."""

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(gold_path)
        except Exception:  # first batch: table does not exist yet
            existing = None
        fresh = anti_dup_append(batch, existing, natural_key)
        fresh.write.mode("append").parquet(gold_path)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
