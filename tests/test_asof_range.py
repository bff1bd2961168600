"""As-of join + binned range join operator tests, including equivalence
of the DataFrame operator against the window-SQL formulation."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from nyc_taxi_bigdata_pipeline_spark.operators.asof import asof_join, range_join_binned


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, _t(5), 100.0), (1, _t(10), 101.0), (2, _t(3), 50.0), (3, _t(7), 9.0)],
        "sym int, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            (1, _t(4), 99.5),
            (1, _t(5), 99.9),   # same-minute quote: inclusive as-of must pick it
            (1, _t(9), 100.5),
            (2, _t(1), 49.0),
            # sym 3 has no quotes at all
        ],
        "sym int, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["bid"]).collect()
    got = {(r["sym"], r["px"]): r["bid_asof"] for r in out}
    assert got[(1, 100.0)] == 99.9   # equal-timestamp quote wins (inclusive)
    assert got[(1, 101.0)] == 100.5  # latest prior
    assert got[(2, 50.0)] == 49.0
    assert got[(3, 9.0)] is None     # no right rows for the key
    assert len(out) == trades.count()  # left-preserving


def test_asof_join_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["bid"], tolerance_seconds=90)
    got = {(r["sym"], r["px"]): r["bid_asof"] for r in out.collect()}
    assert got[(1, 100.0)] == 99.9   # 0s old — kept
    assert got[(1, 101.0)] == 100.5  # 60s old — kept
    assert got[(2, 50.0)] is None    # 120s old — dropped by tolerance


def test_asof_operator_matches_sql_query(spark, sf_dir):
    """The DataFrame as-of operator and the oracle-checked union+window
    SQL query must agree on the events purchase↔view task."""
    import pyspark.sql.functions as F
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(purchases, views, "user_id", "ts", "ts", ["ts"], suffix="_view")
    got = {
        (r["user_id"], r["event_id"]): r["ts_view"] for r in out.collect()
    }
    want_rows = REGISTRY["asof_purchase_view"].spark_fn(spark, sf_dir).collect()
    assert len(got) == len(want_rows)
    for r in want_rows:
        opv = got[(r["user_id"], r["purchase_id"])]
        want_us = r["last_view_t"]
        got_us = None if opv is None else int(opv.timestamp() * 1_000_000)
        assert got_us == want_us, (r, opv)


def test_range_join_binned_matches_naive(spark):
    points = spark.range(0, 1000).selectExpr("id", "CAST(id % 97 AS DOUBLE) AS v")
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 50.0), ("c", 90.0, 97.0), ("d", 200.0, 300.0)],
        "tag string, lo double, hi double",
    )
    binned = range_join_binned(points, intervals, "v", "lo", "hi", bin_width=7.0)
    naive = points.join(
        intervals, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
    )
    got = sorted((r["id"], r["tag"]) for r in binned.collect())
    want = sorted((r["id"], r["tag"]) for r in naive.collect())
    assert got == want and len(got) > 0
    # empty-result interval is fine
    assert not any(t == "d" for _, t in got)


def test_range_join_left_how(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 500.0)], "id int, v double")
    intervals = spark.createDataFrame([("a", 0.0, 10.0)], "tag string, lo double, hi double")
    inner = range_join_binned(points, intervals, "v", "lo", "hi", bin_width=10.0)
    assert [r["id"] for r in inner.collect()] == [1]


def test_keyed_interval_join_matches_naive(spark, sf_dir):
    """Time-bucketed interval join must produce EXACTLY the naive
    key-equi-join + band residual's pair set (each pair matches in
    exactly one probed bucket — no dups, no misses at bucket edges)."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.operators.asof import keyed_interval_join
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id", "event_type"
    )
    lookback = 30 * 60 * 1_000_000
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("t").alias("p_ts"), F.col("event_id").alias("pid")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("t").alias("v_ts")
    )
    naive = {
        (r["pid"], r["v_ts"])
        for r in p.join(
            v,
            (p["user_id"] == v["vu"])
            & (v["v_ts"] >= p["p_ts"] - F.lit(lookback))
            & (v["v_ts"] <= p["p_ts"]),
        ).collect()
    }
    bucketed = {
        (r["pid"], r["v_ts"])
        for r in keyed_interval_join(
            p, v.withColumnRenamed("vu", "user_id"), "user_id",
            "p_ts", "v_ts", lookback,
        ).collect()
    }
    assert bucketed == naive and naive


def test_keyed_interval_join_bucket_edges(spark):
    """Hand-built edge cases: right rows exactly AT the band bounds and
    across a bucket boundary must resolve inclusively/exclusively as the
    contract says (t-lookback and t both inclusive)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.asof import keyed_interval_join

    left = spark.createDataFrame([(1, 1000)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 500), (1, 999), (1, 1000), (1, 1001)],
        "k long, rt long",
    )
    got = sorted(
        r["rt"]
        for r in keyed_interval_join(left, right, "k", "lt", "rt", 999).collect()
    )
    # band = [1000-999, 1000] = [1, 1000]: 0 and 1001 excluded
    assert got == [1, 500, 999, 1000]


def test_keyed_interval_join_epoch_ns_exact(spark):
    """Epoch-ns magnitudes (~1.7e18): DOUBLE division has ulp 256 there,
    so a float-derived bucket id can misassign rows sitting exactly on a
    bucket boundary. The BIGINT pmod/DIV path must keep them."""
    from nyc_taxi_bigdata_pipeline_spark.operators.asof import keyed_interval_join

    base = 1_700_000_000_000_000_000  # plausible epoch-ns, > 2**60
    lb = 1_800_000_000_000  # 30 min in ns
    # left event exactly at a bucket boundary; right rows at the band
    # edges ±1 ns around it
    lt = (base // lb + 1) * lb
    left = spark.createDataFrame([(1, lt)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, lt - lb - 1), (1, lt - lb), (1, lt - 1), (1, lt), (1, lt + 1)],
        "k long, rt long",
    )
    got = sorted(
        r["rt"] - lt
        for r in keyed_interval_join(left, right, "k", "lt", "rt", lb).collect()
    )
    assert got == [-lb, -1, 0]


def test_keyed_interval_join_negative_times(spark):
    """Pre-epoch (negative) integral times: pmod-based floor-div must
    still bucket consistently (DIV alone truncates toward zero)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.asof import keyed_interval_join

    left = spark.createDataFrame([(1, -1000)], "k long, lt long")
    right = spark.createDataFrame(
        [(1, -2001), (1, -2000), (1, -1500), (1, -1000), (1, -999)],
        "k long, rt long",
    )
    got = sorted(
        r["rt"]
        for r in keyed_interval_join(left, right, "k", "lt", "rt", 1000).collect()
    )
    # band = [-2000, -1000] inclusive
    assert got == [-2000, -1500, -1000]
