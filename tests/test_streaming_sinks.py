"""Stream-static joins, watermark dedup, and the idempotent foreachBatch
gold upsert (exactly-once-per-key on top of at-least-once delivery)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table
from nyc_taxi_bigdata_pipeline_spark.streaming import events as ev
from nyc_taxi_bigdata_pipeline_spark.streaming import sinks


@pytest.fixture(scope="module")
def events_df(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events").cache()


def test_enrich_stream_static_join(spark, events_df, tmp_path):
    src = str(tmp_path / "src")
    events_df.write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).parquet(src)
    q = (
        sinks.enrich_stream(stream, {"event_type": dim})
        .writeStream.format("memory").queryName("enriched")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120); q.stop()
    out = spark.sql("SELECT count(*) n, count(weight) w FROM enriched").first()
    assert out["n"] == events_df.count()
    assert out["w"] == out["n"]  # every type matched the dim


def test_dedup_within_watermark(spark, events_df, tmp_path):
    # duplicate the whole feed (at-least-once delivery simulation)
    src = str(tmp_path / "dup_src")
    events_df.unionByName(events_df).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).parquet(src)
    q = (
        sinks.dedup_within_watermark(stream, "event_id", watermark="10 minutes")
        .writeStream.format("memory").queryName("deduped")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120); q.stop()
    n = spark.sql("SELECT count(DISTINCT event_id) d, count(*) n FROM deduped").first()
    assert n["d"] == events_df.count()
    assert n["n"] == n["d"]  # duplicates dropped


def test_foreach_batch_upsert_idempotent(spark, events_df, tmp_path):
    gold = str(tmp_path / "gold_events")
    src = str(tmp_path / "up_src")
    events_df.write.mode("overwrite").parquet(src)

    def run(checkpoint: str):
        stream = spark.readStream.schema(ev.EVENT_SCHEMA).parquet(src)
        q = sinks.foreach_batch_upsert(
            stream, gold, ["event_id"], str(tmp_path / checkpoint)
        )
        q.awaitTermination(180)
        q.stop()

    run("cp1")
    n1 = spark.read.parquet(gold).count()
    assert n1 == events_df.count()
    # redeliver the identical feed with a FRESH checkpoint (worst-case
    # replay): the anti-dup append must insert nothing
    run("cp2")
    n2 = spark.read.parquet(gold).count()
    assert n2 == n1


def test_foreach_batch_agg_maintain(spark, tmp_path):
    """Streamed incremental agg view must equal the batch groupBy over
    everything that flowed through, across multiple runs (new files
    between runs -> new micro-batches merged into the stored view)."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.streaming import sinks

    src = tmp_path / "src"
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    schema = "k string, v bigint"

    def run_batch(rows, part):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        q = sinks.foreach_batch_agg_maintain(
            stream, view, ["k"], ["v"], ckpt, count_col="cnt"
        )
        q.awaitTermination(120)

    run_batch([("a", 1), ("a", 2), ("b", 5)], "p1")
    run_batch([("a", 10), ("c", 7)], "p2")

    got = {r["k"]: (r["v"], r["cnt"]) for r in spark.read.parquet(view).collect()}
    assert got == {"a": (13, 3), "b": (5, 1), "c": (7, 1)}
