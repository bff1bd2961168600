"""Pins for the motion-JPEG video layer (operators/multimodal.py):
codec round-trip, frame-boundary walking, keyframe detection, and the
video_keyframe_dedup query's planted-duplicate recovery."""

from __future__ import annotations

import numpy as np
import pytest

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
    decode_jpeg,
    decode_mjpeg,
    encode_jpeg,
    encode_mjpeg,
    phash63,
    video_frame_phashes,
    video_keyframes,
)


def _noise(seed: int, hw: int = 24) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (hw, hw, 3), dtype=np.uint8)


def test_mjpeg_round_trip_matches_per_frame_jpeg():
    """decode(encode(frames)) must yield exactly the per-frame JPEG
    round-trip results — the stream layer adds no loss beyond JPEG's."""
    frames = [_noise(i) for i in range(5)]
    dec = decode_mjpeg(encode_mjpeg(frames))
    ref = [decode_jpeg(encode_jpeg(f)) for f in frames]
    assert len(dec) == 5
    for a, b in zip(dec, ref):
        assert (a == b).all()


def test_mjpeg_rejects_truncated_stream():
    clip = encode_mjpeg([_noise(0), _noise(1)])
    with pytest.raises(ValueError):
        decode_mjpeg(clip[:-3])


def test_mjpeg_frame_sizes_may_differ():
    """Frame boundaries come from the structural walk, not fixed sizes —
    mixed-resolution clips must still split correctly."""
    frames = [_noise(0, 16), _noise(1, 24), _noise(2, 32)]
    dec = decode_mjpeg(encode_mjpeg(frames))
    assert [f.shape for f in dec] == [(16, 16, 3), (24, 24, 3), (32, 32, 3)]


def test_video_keyframes_detect_scene_change(spark):
    """A 2-scene clip (frames 0-1 scene A, 2-3 scene B) must yield
    exactly keyframes {0, 2}; a byte-identical duplicate clip must
    produce identical frame hashes."""
    import pandas as pd

    a, b = _noise(100), _noise(101)
    clip = encode_mjpeg([a, a, b, b])
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": ["v1", "v2"], "kind": ["video"] * 2,
             "content": [clip, clip]}
        )
    )
    hashes = video_frame_phashes(media).toPandas()
    assert len(hashes) == 8
    h1 = hashes[hashes.media_id == "v1"].sort_values("frame_idx").phash.tolist()
    h2 = hashes[hashes.media_id == "v2"].sort_values("frame_idx").phash.tolist()
    assert h1 == h2  # byte-identical clips → identical hashes
    assert h1[0] == h1[1] and h1[2] == h1[3]  # within-scene stability
    kf = video_keyframes(video_frame_phashes(media), max_hamming=2).toPandas()
    assert sorted(kf[kf.media_id == "v1"].frame_idx.tolist()) == [0, 2]
    assert sorted(kf[kf.media_id == "v2"].frame_idx.tolist()) == [0, 2]


def test_video_keyframe_dedup_recovers_planted_dups(spark, sf_dir):
    """At 500 docs: 50 clips (doc_id % 10 == 0), ids ≡ 10 (mod 100)
    replay the previous clip → 5 duplicate pairs; every clip has the
    2 planted scenes → 2 keyframes each."""
    row = REGISTRY["video_keyframe_dedup"].spark_fn(spark, sf_dir).collect()[0]
    assert row["total_videos"] == 50
    assert row["dup_videos_removable"] == 5
    assert row["distinct_videos"] == 45
    assert row["total_keyframes"] == 2 * 50
