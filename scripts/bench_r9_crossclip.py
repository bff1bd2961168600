"""Scale probe for operators/multimodal.crossclip_segment_pairs.

Synthesizes keyframe-hash frames DIRECTLY (no codec — the decode path
is probed by the registry fixture; this isolates the candidate
block-join + alignment verification, the parts that scale): n_clips
clips x 4 keyframes of splitmix-derived 63-bit hashes; 2% of clips
replay the previous clip's hashes with 2 bits flipped per hash (the
re-encode analogue), planted at seq offset 0.

Pass bar: planted pairs recovered exactly. Cost shape (r10, with the
guaranteed-recall 1-flip probe expansion at max_hamming=6): candidates
grow ~17·n²/2^16 — measured 7.4 / 24.1 / 418 s at 10k / 100k / 1M
clips. The r9 numbers (3.3 / 4.7 / 37.2 s) were the recall-UNSOUND
plan (plain block equality misses distance-4-6 pairs whose flips touch
all four blocks); max_hamming=3 still gets that cost with sound recall
at the smaller radius.

Usage: python scripts/bench_r9_crossclip.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
    crossclip_segment_pairs,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def synth_keyframes(spark, n_clips: int, kf_per_clip: int = 4):
    """(media_id, frame_idx, phash): clip c's keyframe i hash derives
    from (base(c), i); clips with c % 50 == 1 replay clip c-1's hashes
    with bits 3 and 47 flipped (hamming 2 per keyframe)."""
    base = f"CASE WHEN id % 50 = 1 THEN id - 1 ELSE id END"
    flip = "CASE WHEN id % 50 = 1 THEN 140737488355336 ELSE 0 END"  # bits 3,47
    return (
        spark.range(n_clips)
        .selectExpr(
            "CAST(id AS STRING) AS media_id",
            f"transform(sequence(0, {kf_per_clip - 1}), i -> named_struct("
            f"  'frame_idx', CAST(i * 2 AS INT),"
            f"  'phash', abs(xxhash64({base}, i, 99)) % 9223372036854775807"
            f"           ^ ({flip}))) AS kfs",
        )
        .select("media_id", F.explode("kfs").alias("k"))
        .select("media_id", F.col("k.frame_idx").alias("frame_idx"), F.col("k.phash").alias("phash"))
        .repartition(32)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 1M-clip tier")
    args = ap.parse_args()
    spark = get_spark("bench-r9-crossclip")

    for n in [10_000, 100_000] + ([1_000_000] if args.full else []):
        kf = synth_keyframes(spark, n).localCheckpoint(eager=True)
        got = {}
        timed(
            f"crossclip_segment_pairs @ {n} clips ({n * 4} keyframes)",
            lambda: got.setdefault(
                "rows",
                crossclip_segment_pairs(kf, max_hamming=6, min_aligned=2).collect(),
            )
            and None,
        )
        rows = got["rows"]
        planted = sum(1 for c in range(n) if c % 50 == 1)
        aligned = [r for r in rows if r.seq_offset == 0 and r.aligned_keyframes == 4]
        print(
            f"  -> {len(rows)} pairs ({len(aligned)} full-alignment), "
            f"planted {planted}, mean hamming of planted class "
            f"{sum(r.mean_hamming for r in aligned) / max(len(aligned), 1):.2f}"
        )
        assert len(aligned) >= planted, "planted replays must all surface"
        kf.unpersist()


if __name__ == "__main__":
    main()
