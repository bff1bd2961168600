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


def test_crossclip_segment_pairs_alignment_logic(spark):
    """Pure operator semantics on constructed keyframes: a shared
    3-keyframe segment at a consistent offset is found; scattered
    single-block collisions at inconsistent offsets are not."""
    import pandas as pd

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        crossclip_segment_pairs,
    )

    h = [0x1111_2222_3333_4444, 0x5555_6666_7777_0888, 0x0123_4567_89AB_CDEF]
    rows = []
    # clip A: segment at frames 0,2,4; clip B: same hashes shifted by
    # one keyframe position (seq offset 1); one hash with 2 flipped bits
    for i, ph in enumerate(h):
        rows.append(("a", i * 2, ph))
    rows.append(("b", 0, 0x0F0F_0F0F_0F0F_0F0F))
    for i, ph in enumerate(h):
        rows.append(("b", 10 + i, ph ^ (0b11 if i == 1 else 0)))
    # clip C shares ONE block value with A's first hash but at hamming
    # distance way beyond the verify bound -> no pair
    rows.append(("c", 0, 0x7FFF_FFFF_FFFF_4444))
    kf = spark.createDataFrame(rows, "media_id string, frame_idx int, phash long")
    got = crossclip_segment_pairs(kf, max_hamming=6, min_aligned=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.media_a, r.media_b, r.seq_offset, r.aligned_keyframes) == ("a", "b", 1, 3)
    assert abs(r.mean_hamming - 2.0 / 3.0) < 1e-12
    # raising the alignment bar above the planted run drops it
    assert crossclip_segment_pairs(kf, max_hamming=6, min_aligned=4).count() == 0


def test_video_crossclip_dedup_recovers_planted_pairs(spark, sf_dir):
    """At the 500-doc fixture: 50 clips; per hundred doc_ids the plant
    yields 1 byte-exact pair (0,10), 2 re-encoded pairs (0,20),(10,20)
    and 1 re-encoded pair (60,70) -> 20 clip pairs total, every one a
    full 3-keyframe alignment at offset 0. The exact/near split by
    mean hamming is codec-dependent (a re-encode may land on the
    identical phash - that is phash stability, not a miss), so the pin
    is on the TOTALS."""
    rows = REGISTRY["video_crossclip_dedup"].spark_fn(spark, sf_dir).collect()
    assert sum(r.clip_pairs for r in rows) == 20
    assert sum(r.aligned_keyframes for r in rows) == 60
    exact = [r for r in rows if r.dup_kind == "exact"]
    assert exact and exact[0].avg_hamming == 0.0
    assert exact[0].clip_pairs >= 5  # the 5 byte-identical replays at least


def test_crossclip_recall_beyond_three_flips(spark):
    """r9 ADVICE: pairs at Hamming 4-6 whose flipped bits touch ALL four
    16-bit blocks must still be generated as candidates (plain block
    equality would pigeonhole them away). The 1-flip probe expansion
    guarantees radius <= 7; above 7 the operator must refuse."""
    import pytest

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        crossclip_segment_pairs,
    )

    base = [0x1111_2222_3333_4444, 0x5555_6666_7777_0888]
    # flips spread over all four blocks: bits 0, 16, 32, 48 (d=4) and
    # bits 0, 1, 16, 32, 48, 62 (d=6) — no block left intact
    d4 = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
    d6 = d4 | (1 << 1) | (1 << 62)
    rows = [("a", i, ph) for i, ph in enumerate(base)]
    rows += [("b", i, ph ^ d4) for i, ph in enumerate(base)]
    rows += [("c", i, ph ^ d6) for i, ph in enumerate(base)]
    kf = spark.createDataFrame(rows, "media_id string, frame_idx int, phash long")

    got = {
        (r.media_a, r.media_b): r.aligned_keyframes
        for r in crossclip_segment_pairs(kf, max_hamming=6, min_aligned=2).collect()
    }
    # a~b at d=4, a~c at d=6, b~c at d=2 — all three recovered
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 2}

    # radius <= 3 path unchanged: only the d=2 pair survives the verify
    got3 = {
        (r.media_a, r.media_b)
        for r in crossclip_segment_pairs(kf, max_hamming=3, min_aligned=2).collect()
    }
    assert got3 == {("b", "c")}

    with pytest.raises(ValueError, match="max_hamming"):
        crossclip_segment_pairs(kf, max_hamming=8)
