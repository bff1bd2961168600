"""Scale probes for the round-6 operator additions.

- BM25 (`operators/search.bm25_topk`) over salted docs at 1x/10x/100x:
  the postings stats are two corpus-linear aggregations; scoring
  touches only the query terms' postings. Seconds should scale with
  the corpus scan, and the scored-postings row count with df of the
  query terms.
- Bigram LM (`operators/text.bigram_logprob_features`) at the same
  tiers: two vocabulary-shaped dims (C2 bigrams, C1 unigrams) joined
  back WITHOUT broadcast hints — AQE decides (Heaps' law note in
  operators/text.py); the fold is one doc-id shuffle.
- Audio spectrograms (`operators/multimodal.audio_spectrograms`):
  decode + Hann STFT + descriptor per clip, Arrow-batched; clips/s is
  the number (payloads never shuffle).

All corpora deterministic (no RNG), repartitioned to 32 (single-file
scan x broadcast range is ONE partition — working-notes pitfall).

Usage: python scripts/bench_r6_newops.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.search import bm25_topk
from nyc_taxi_bigdata_pipeline_spark.operators.text import (
    bigram_logprob_features,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed
from scripts.bench_r5_newops import salted_docs

_QUERIES = [(1, "hash join"), (2, "scan filter column"), (3, "sort merge window")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 100x tiers")
    args = ap.parse_args()
    spark = get_spark("bench-r6-newops")

    tiers = (10, 100) if args.full else (10,)
    for reps in (1,) + tiers:
        docs = salted_docs(spark, reps).localCheckpoint(eager=True)
        n = docs.count()
        timed(
            f"bm25_topk (3 queries, k=10) @ {n} docs",
            lambda: bm25_topk(spark, docs, _QUERIES, k=10).count(),
        )
        timed(
            f"bigram_logprob @ {n} docs",
            lambda: bigram_logprob_features(docs, "doc_id", "text").count(),
        )
        docs.unpersist()

    # ---- spectrogram throughput over synthetic WAV clips
    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        audio_spectrograms,
        encode_wav,
    )
    import pandas as pd

    for n_clips in (2_000, 20_000) if args.full else (2_000,):
        base = spark.range(n_clips).repartition(32)

        def synth(batches):
            rate, ns = 16000, 4000
            t = np.arange(ns, dtype=np.float64) / rate
            for pdf in batches:
                out = []
                for d in pdf["id"]:
                    d = int(d)
                    f0 = 200.0 + (d * 997) % 7600
                    x = np.round(np.sin(2 * np.pi * f0 * t) * 30000).astype(
                        np.int16
                    )
                    out.append((str(d), "audio", bytearray(encode_wav(x, rate))))
                yield pd.DataFrame(out, columns=["media_id", "kind", "content"])

        media = base.mapInPandas(
            synth, "media_id string, kind string, content binary"
        ).localCheckpoint(eager=True)
        t = timed(
            f"audio_spectrograms @ {n_clips} clips (0.25 s each)",
            lambda: audio_spectrograms(media).count(),
        )
        print(f"  -> {n_clips / max(t, 1e-9):.0f} clips/s")
        media.unpersist()


if __name__ == "__main__":
    main()
