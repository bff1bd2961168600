"""Structured Streaming tests: windowed aggregation and stateful
sessionization, checked against their batch twins on the events table."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table
from nyc_taxi_bigdata_pipeline_spark.streaming import events as ev


@pytest.fixture(scope="module")
def events_df(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events").cache()


def test_windowed_counts_batch_semantics(spark, events_df):
    out = ev.windowed_counts(events_df, "1 hour").collect()
    total = sum(r["cnt"] for r in out)
    assert total == events_df.count()
    for r in out:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 3600


def test_windowed_counts_streaming_with_watermark(spark, events_df, tmp_path):
    src = str(tmp_path / "stream_src")
    events_df.repartition(4).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 2
    ).parquet(src)
    agg = ev.windowed_counts(stream, "1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(cnt) FROM win_counts").first()[0]
    assert got == events_df.count()
    q.stop()


def test_sliding_window_counts(spark, events_df):
    out = ev.windowed_counts(events_df, "1 hour", slide="30 minutes").collect()
    # every event lands in exactly 2 overlapping windows
    assert sum(r["cnt"] for r in out) == 2 * events_df.count()
    for r in out:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 3600


def test_hopping_sql_matches_native_window(spark, events_df):
    """The hopping_window_topk registry SQL's integer hop arithmetic
    (explode k-3..k of sec div 900) must reproduce Structured Streaming's
    window(ts, '1 hour', '15 minutes') grid exactly — window starts are
    epoch-aligned multiples of the hop, end-exclusive."""
    e = events_df.filter(F.col("ts").isNotNull())
    native = (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .count()
        .select(
            F.expr("unix_micros(w.start) div 1000000").alias("window_start"),
            "event_type",
            F.col("count").alias("cnt"),
        )
    )
    k = F.expr("unix_micros(ts) div 1000000 div 900")
    hop = e.select(F.explode(F.sequence(k - 3, k)).alias("w"), "event_type")
    twin = hop.groupBy((F.col("w") * 900).alias("window_start"), "event_type").agg(
        F.count("*").alias("cnt")
    )
    n = sorted(map(tuple, native.collect()))
    t = sorted(map(tuple, twin.collect()))
    assert n == t and len(n) > 0


def test_sessionize_batch_twin(spark, events_df):
    sessions = ev.sessionize_batch(events_df, gap="30 minutes")
    rows = sessions.collect()
    assert sum(r["n_events"] for r in rows) == events_df.count()
    # sessions are disjoint per user and ordered
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ss in by_user.items():
        ss.sort(key=lambda r: r["session_start"])
        for a, b in zip(ss, ss[1:]):
            assert a["session_end"] < b["session_start"]
            gap = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap > 30 * 60  # split only on real gaps


def test_sessionize_multi_batch_state_merge(spark, events_df, tmp_path):
    """Force MANY micro-batches (one file per trigger, files split along
    time order) so sessions span batch boundaries — exercising the
    open-session state merge and the event-time timeout path."""
    subset = events_df.filter(F.col("user_id") < 10).orderBy("ts")
    rows = subset.collect()
    src = str(tmp_path / "mb_src")
    third = max(1, len(rows) // 3)
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third if i < 2 else len(rows)]
        spark.createDataFrame(chunk, subset.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        ev.sessionize(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("mb_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM mb_sessions").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ev.sessionize_batch(subset, gap="30 minutes").collect()
    }
    # every emitted session must be a true session; cross-batch merges
    # must not fragment them
    assert got <= want
    assert len(got) >= len(want) * 0.5


def test_sessionize_streaming_matches_batch(spark, events_df, tmp_path):
    # restrict to a few users to keep state small
    subset = events_df.filter(F.col("user_id") < 20)
    src = str(tmp_path / "sess_src")
    subset.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).parquet(src)
    q = (
        ev.sessionize(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in ev.sessionize_batch(subset, gap="30 minutes").collect()
    }
    # the final (unclosed) session per user never times out in a finite
    # run: compare on the sessions the stream did emit, require substance
    assert got <= want
    assert len(got) >= len(want) * 0.5


def test_stream_dedup_with_watermark(spark, events_df, tmp_path):
    """At-least-once delivery: the same events fed twice through a
    stream must come out once. Long watermark so no row is late-dropped
    in this finite replay; on a live feed the watermark bounds state."""
    src = str(tmp_path / "dup_src")
    base = events_df
    n = base.count()
    base.write.mode("overwrite").parquet(src)
    base.write.mode("append").parquet(src)  # duplicate the whole feed
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).option(
        "maxFilesPerTrigger", 3
    ).parquet(src)
    dd = ev.dedup_stream(stream, watermark="8760 hours")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM dedup_out").first()[0]
    assert got == n
    assert spark.sql("SELECT count(DISTINCT event_id) FROM dedup_out").first()[0] == n
    q.stop()
    # batch twin: static frame takes the plain dropDuplicates path
    assert ev.dedup_stream(spark.read.parquet(src)).count() == n


def test_purchase_view_join_stream_matches_batch(spark, events_df, tmp_path):
    batch = ev.purchase_view_join(events_df).collect()
    assert batch, "sf0.001 events should yield at least one purchase-view pair"
    # every pair respects the 30-minute lookback band
    for r in batch:
        lag = (r["p_ts"] - r["v_ts"]).total_seconds()
        assert 0 <= lag <= 1800

    expected = {(r["purchase_id"], r["v_ts"]) for r in batch}
    src = str(tmp_path / "ppv_src")
    events_df.repartition(4).write.mode("overwrite").parquet(src)

    def run_stream(name: str, **reader_opts) -> set:
        reader = spark.readStream.schema(ev.EVENT_SCHEMA)
        for k, v in reader_opts.items():
            reader = reader.option(k, v)
        q = (
            ev.purchase_view_join(reader.parquet(src))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        q.stop()
        return {(r["purchase_id"], r["v_ts"]) for r in rows}

    # all files in one micro-batch: no event precedes the watermark, so
    # the stream-stream join reproduces the batch twin exactly
    assert run_stream("ppv_join_one") == expected

    # one unordered file per micro-batch: the watermark races ahead of
    # out-of-order arrivals, so cross-batch matches whose view fell
    # behind it are DROPPED — the result must be a subset of the batch
    # twin (this is the bounded-state late-data contract, not a bug)
    multi = run_stream("ppv_join_multi", maxFilesPerTrigger=1)
    assert multi <= expected


def test_sessionize_native_matches_sql_twin(spark, sf_dir):
    """Built-in session_window must produce the same sessions as the
    gaps-and-islands SQL twin (modulo the documented end-time shift:
    native end = last event + gap)."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.benchqueries import advanced  # noqa: F401 registers
    from nyc_taxi_bigdata_pipeline_spark.benchqueries.registry import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table
    from nyc_taxi_bigdata_pipeline_spark.streaming.events import sessionize_native

    gap_us = 30 * 60 * 1_000_000
    twin = {
        (r["user_id"], r["start_us"], r["end_us"] + gap_us, r["n_events"])
        for r in REGISTRY["sessionize_events"].spark_fn(spark, sf_dir).collect()
    }
    native = {
        (
            r["user_id"],
            r["session_start"].timestamp() * 1_000_000,
            r["session_close"].timestamp() * 1_000_000,
            r["n_events"],
        )
        for r in sessionize_native(load_table(spark, sf_dir, "events")).collect()
    }
    native = {(u, int(round(s)), int(round(e)), n) for u, s, e, n in native}
    assert native == twin


def test_stream_stream_left_outer_join_matches_batch(spark, tmp_path):
    """Outer stream-stream interval join: matched rows identical to the
    batch twin, unmatched purchases emitted with NULL view time once the
    watermark passes (single micro-batch => all state closes)."""
    events_df = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ssj_src")
    events_df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.EVENT_SCHEMA).parquet(src)
    q = (
        ev.purchase_view_join_outer(stream)
        .writeStream.format("memory").queryName("pvout")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180); q.stop()
    got = spark.sql(
        "SELECT purchase_id, unix_micros(v_ts) AS v_us FROM pvout"
    ).collect()
    # NULL rows for purchases inside the final watermark horizon are
    # WITHHELD when the stream ends (no-match is not yet provable) —
    # correct outer semantics, so compare only the provable region
    horizon = events_df.selectExpr(
        "unix_micros(MAX(ts)) - 7200000000 AS h"  # 2h in µs (BIGINT literal)
    ).first()["h"]
    want = {
        (r["purchase_id"], r["v_us"])
        for r in ev.purchase_view_join_outer(events_df)
        .selectExpr("purchase_id", "unix_micros(v_ts) AS v_us",
                    "unix_micros(p_ts) AS p_us")
        .collect()
        if r["v_us"] is not None or r["p_us"] <= horizon
    }
    assert {(r["purchase_id"], r["v_us"]) for r in got} >= want
    extra = {(r["purchase_id"], r["v_us"]) for r in got} - want
    assert all(v is None for _, v in extra)  # only late-region NULLs may differ
    # outer semantics: some purchases really have no preceding view
    nulls = [r for r in got if r["v_us"] is None]
    assert nulls, "expected at least one cold purchase"
    # and every batch-inner match appears identically
    inner = ev.purchase_view_join(events_df).count()
    assert len([r for r in got if r["v_us"] is not None]) == inner


def _run_outer_stream(spark, tmp_path, name, how, **read_opts):
    events_df = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / f"{name}_src")
    events_df.write.mode("overwrite").parquet(src)
    reader = spark.readStream.schema(ev.EVENT_SCHEMA)
    for k, v in read_opts.items():
        reader = reader.option(k, v)
    stream = reader.parquet(src)
    q = (
        ev.purchase_view_join_outer(stream, how=how)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    q.stop()
    return events_df, spark.sql(
        "SELECT user_id, purchase_id, unix_micros(v_ts) AS v_us,"
        " unix_micros(p_ts) AS p_us FROM " + name
    ).collect()


def test_stream_stream_right_outer_join_matches_batch(spark, tmp_path):
    """Right-outer stream-stream interval join: every matched pair
    identical to the batch inner twin; views that converted nothing
    appear with NULL purchase columns once the watermark proves no
    purchase can still arrive (v_ts + lookback behind the watermark)."""
    events_df, got = _run_outer_stream(spark, tmp_path, "pv_right", "right_outer")
    # matched region must equal the batch inner join exactly
    inner = {
        (r["user_id"], r["purchase_id"], r["v_us"])
        for r in ev.purchase_view_join(events_df)
        .selectExpr("user_id", "purchase_id", "unix_micros(v_ts) AS v_us")
        .collect()
    }
    matched = {(r["user_id"], r["purchase_id"], r["v_us"])
               for r in got if r["purchase_id"] is not None}
    assert matched == inner
    # unmatched views: NULL purchase columns, user_id survives the
    # coalesce, and the batch right-outer twin agrees on the provable
    # region (view's match window fully behind the final watermark)
    horizon = events_df.selectExpr(
        "unix_micros(MAX(ts)) - 7200000000 - 1800000000 AS h"
    ).first()["h"]
    want_nulls = {
        (r["user_id"], r["v_us"])
        for r in ev.purchase_view_join_outer(events_df, how="right_outer")
        .selectExpr("user_id", "purchase_id", "unix_micros(v_ts) AS v_us")
        .collect()
        if r["purchase_id"] is None and r["v_us"] <= horizon
    }
    got_nulls = {(r["user_id"], r["v_us"]) for r in got if r["purchase_id"] is None}
    assert got_nulls >= want_nulls
    assert all(u is not None for u, _ in got_nulls)
    assert want_nulls, "expected at least one non-converting view"


def test_stream_stream_full_outer_join_matches_batch(spark, tmp_path):
    """Full-outer stream-stream interval join: matched pairs = batch
    inner twin; BOTH unmatched families appear NULL-padded (cold
    purchases and non-converting views) in the provable region."""
    events_df, got = _run_outer_stream(spark, tmp_path, "pv_full", "full_outer")
    inner = {
        (r["user_id"], r["purchase_id"], r["v_us"])
        for r in ev.purchase_view_join(events_df)
        .selectExpr("user_id", "purchase_id", "unix_micros(v_ts) AS v_us")
        .collect()
    }
    matched = {(r["user_id"], r["purchase_id"], r["v_us"])
               for r in got if r["purchase_id"] is not None and r["v_us"] is not None}
    assert matched == inner
    p_horizon = events_df.selectExpr(
        "unix_micros(MAX(ts)) - 7200000000 AS h"
    ).first()["h"]
    batch_full = ev.purchase_view_join_outer(events_df, how="full_outer").selectExpr(
        "user_id", "purchase_id", "unix_micros(v_ts) AS v_us",
        "unix_micros(p_ts) AS p_us"
    ).collect()
    want_cold = {
        (r["user_id"], r["purchase_id"])
        for r in batch_full
        if r["v_us"] is None and r["p_us"] is not None and r["p_us"] <= p_horizon
    }
    got_cold = {(r["user_id"], r["purchase_id"])
                for r in got if r["v_us"] is None and r["purchase_id"] is not None}
    assert got_cold >= want_cold and want_cold
    v_horizon = p_horizon - 1800000000
    want_views = {
        (r["user_id"], r["v_us"])
        for r in batch_full
        if r["purchase_id"] is None and r["v_us"] <= v_horizon
    }
    got_views = {(r["user_id"], r["v_us"])
                 for r in got if r["purchase_id"] is None}
    assert got_views >= want_views and want_views


def test_stream_stream_outer_join_late_data_subset(spark, tmp_path):
    """Single-file micro-batches over unordered files: the watermark
    races ahead, late matches are DROPPED (bounded-state contract, see
    CLAUDE.md) — matched rows must be a SUBSET of the batch inner twin,
    never invented."""
    events_df, got = _run_outer_stream(
        spark, tmp_path, "pv_left_late", "left_outer", maxFilesPerTrigger=1
    )
    inner = {
        (r["user_id"], r["purchase_id"], r["v_us"])
        for r in ev.purchase_view_join(events_df)
        .selectExpr("user_id", "purchase_id", "unix_micros(v_ts) AS v_us")
        .collect()
    }
    matched = {(r["user_id"], r["purchase_id"], r["v_us"])
               for r in got if r["v_us"] is not None}
    assert matched <= inner
    # every emitted purchase id is real (no row invention under replayed
    # or out-of-order arrival)
    purchase_ids = {
        r["event_id"]
        for r in events_df.filter("event_type = 'purchase'").collect()
    }
    assert {r["purchase_id"] for r in got} <= purchase_ids


# ----------------------------------------------- streaming heavy hitters


def _run_hh_stream(spark, tmp_path, rows, capacity, buckets, qname):
    from nyc_taxi_bigdata_pipeline_spark.streaming.heavyhitters import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path / f"hh_src_{qname}")
    df = spark.createDataFrame(rows, "token string")
    df.repartition(5).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", 1)  # force multi-batch state merging
        .parquet(src)
    )
    hh = streaming_heavy_hitters(stream, capacity=capacity, buckets=buckets)
    q = (
        hh.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    # latest emission per bucket supersedes earlier ones (bucket_n is
    # monotone per bucket)
    rows = spark.sql(
        f"""SELECT token, mg_weight FROM {qname} t
            WHERE bucket_n = (SELECT MAX(bucket_n) FROM {qname} u
                              WHERE u.bucket = t.bucket)"""
    ).collect()
    return {r["token"]: r["mg_weight"] for r in rows}


def test_streaming_hh_exact_when_capacity_suffices(spark, tmp_path):
    """capacity ≥ every bucket's vocabulary → no decrements ever fire,
    so the final summaries are EXACT counts regardless of how the
    stream splits into micro-batches."""
    counts = {f"tok{i:02d}": 7 + 13 * i for i in range(40)}
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    got = _run_hh_stream(spark, tmp_path, rows, capacity=64, buckets=4,
                         qname="hh_exact")
    assert got == counts


def test_streaming_hh_superset_and_bounds_under_decrements(spark, tmp_path):
    """Tiny capacity with a long tail: summaries must still contain
    every true heavy hitter, and never overcount."""
    counts = {"hot": 4000, "warm": 1500}
    counts.update({f"tail{i:03d}": 9 for i in range(400)})
    n = sum(counts.values())
    rows = [(t,) for t, c in counts.items() for _ in range(c)]
    cap, buckets = 4, 4
    got = _run_hh_stream(spark, tmp_path, rows, capacity=cap, buckets=buckets,
                         qname="hh_small")
    heavy = {t for t, c in counts.items() if c * (cap + 1) > n}
    assert heavy  # hot qualifies by construction
    assert heavy <= set(got)
    for t, w in got.items():
        assert w <= counts[t]


def test_transform_with_state_pin_still_valid():
    """r10 re-probe of transformWithStateInPandas (r9 verdict item 7):
    the Python driver worker still crashes on this container, root
    cause isolated to the state server's protobuf dependency —
    `ImportError: cannot import name 'descriptor' from
    'google.protobuf'` during StreamingPythonRunner init. That is
    environmental (no pip available), so streaming/ correctly stays on
    applyInPandasWithState. This sentinel self-clears: the moment a
    working protobuf lands in the image, it FAILS with a migration
    pointer instead of letting the pin silently go stale."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        importable = True
    except ImportError:
        importable = False
    assert not importable, (
        "google.protobuf now imports — the transformWithStateInPandas "
        "crash pin (streaming/events.py module docstring) is stale; "
        "re-probe the API and consider migrating heavyhitters.py / the "
        "sessionizer off applyInPandasWithState"
    )
