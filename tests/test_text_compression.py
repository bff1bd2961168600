"""Pins for the deflate-compressibility quality signal (rows-only
query text_compression_signal): per-doc exactness vs direct zlib and
partition invariance."""

from __future__ import annotations

import zlib

import pyspark.sql.functions as F

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


def _expected(sf_dir: str, spark) -> dict[str, tuple]:
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    per_source: dict[str, list[int]] = {}
    for r in rows:
        raw = r["text"].encode("utf-8")
        micro = (len(zlib.compress(raw, 6)) * 1_000_000) // max(len(raw), 1)
        per_source.setdefault(r["source"], []).append(micro)
    out = {}
    for s, ms in per_source.items():
        out[s] = (
            len(ms),
            sum(ms) / 1_000_000.0 / len(ms),
            min(ms) / 1_000_000.0,
            max(ms) / 1_000_000.0,
        )
    return out


def test_compression_signal_matches_direct_zlib(spark, sf_dir):
    got = {
        r["source"]: (r["docs"], r["avg_ratio"], r["min_ratio"], r["max_ratio"])
        for r in REGISTRY["text_compression_signal"].spark_fn(spark, sf_dir).collect()
    }
    want = _expected(sf_dir, spark)
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0]
        for a, b in zip(got[s][1:], want[s][1:]):
            assert abs(a - b) < 1e-12, (s, got[s], want[s])


def test_compression_signal_partition_invariant(spark, sf_dir):
    """The integer micro-ratio aggregation must not depend on the scan
    layout (the signal rides SUM of exact integers, never float order)."""
    base = REGISTRY["text_compression_signal"].spark_fn(spark, sf_dir)
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in base.repartition(13).collect()}
    assert a == b


def test_compression_discriminates_repetitive_text():
    """Sanity on the signal itself: repeated text compresses far better
    than high-entropy text."""
    rep = ("spam " * 200).encode()
    import numpy as np

    noise = bytes(np.random.default_rng(0).integers(0, 256, 1000, dtype=np.uint8))
    r_rep = len(zlib.compress(rep, 6)) / len(rep)
    r_noise = len(zlib.compress(noise, 6)) / len(noise)
    assert r_rep < 0.05 < r_noise
