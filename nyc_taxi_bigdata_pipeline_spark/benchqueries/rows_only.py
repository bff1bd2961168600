"""Rows-only registry entries (no DuckDB oracle — the driver records a
weaker rows+schema check, as the contract allows for genuinely
non-SQL-expressible operators).

Each of these drives a scale-path operator whose semantics are verified
elsewhere: the LSH ANN against the exact top-k (tests/test_operators),
the multimodal plumbing against the deterministic fake decoder, the GBT
pipeline against the reference's quality thresholds (tests/test_ml).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


@register(
    "ann_lsh_topk",
    None,
    doc="training-data ext (rows-only): multi-probe random-hyperplane LSH "
        "ANN top-k; recall vs the exact oracle-checked "
        "similarity_knn_bruteforce is pinned in tests/test_operators.py",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_topk_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ann_topk_lsh(emb, queries, dim=64, k=10, num_planes=4, probe_radius=2)


@register(
    "multimodal_features",
    None,
    doc="training-data ext (rows-only): REAL binary-media decode — every "
        "doc_id deterministically becomes a PPM (P6) image or a PCM WAV "
        "payload (stdlib-encodable, no codec needed), which media_decoder "
        "sniffs and decodes to a 16-dim feature vector via mapInPandas "
        "(operators/multimodal.py); compressed formats remain stubbed",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        encode_ppm,
        encode_wav,
        extract_features,
        media_decoder,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # single-file scan is ONE partition; the per-doc media synth + decode +
    # feature extraction below would otherwise run serially on one core
    # (CLAUDE.md 1-partition scan-layout pitfall, caught by bench --all)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def synth(batches):
        # stand-in for a real media source table: payload bytes derived
        # deterministically from the key (no RNG — append-stable)
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 3 == 0:  # 0.1 s of 16 kHz deterministic PCM
                    t = np.arange(1600)
                    samples = ((d * 13 + t * 37) % 2048 - 1024).astype(np.int16)
                    payload, kind, fmt = encode_wav(samples), "audio", "wav"
                else:  # 8×8 RGB gradient image
                    i, j, c = np.meshgrid(
                        np.arange(8), np.arange(8), np.arange(3), indexing="ij"
                    )
                    img = ((d * 7 + i * 16 + j + c * 31) % 256).astype(np.uint8)
                    payload, kind, fmt = encode_ppm(img), "image", "ppm"
                out.append((str(d), kind, payload, fmt))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "content", "format"]
            )

    media = docs.mapInPandas(
        synth, "media_id string, kind string, content binary, format string"
    )
    feats = extract_features(media, decoder=media_decoder)
    return feats.select(
        "media_id",
        "kind",
        F.round(F.expr("aggregate(features, CAST(0.0 AS DOUBLE), (a, v) -> a + v)"), 6).alias(
            "feature_sum"
        ),
        F.size("features").alias("dim"),
    )


@register(
    "ml_gbt_quick",
    None,
    doc="§2.10 (rows-only): end-to-end MLlib pipeline fit+transform on "
        "lineitem (predict extendedprice from quantity/discount/partkey "
        "buckets); small maxIter so the correctness run stays fast — the "
        "full ex05-parity GBT (maxDepth 6, maxIter 50) is pytest-gated",
)
def ml_gbt_quick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"
    )
    train = li.filter(F.col("l_orderkey") % 10 < 8)
    test = li.filter(F.col("l_orderkey") % 10 >= 8)
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=["l_quantity", "l_discount"], outputCol="features"
            ),
            GBTRegressor(
                featuresCol="features",
                labelCol="l_extendedprice",
                maxDepth=4,
                maxIter=5,
                seed=42,
            ),
        ]
    )
    model = pipe.fit(train)
    preds = model.transform(test)
    return preds.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.round("prediction", 2).alias("prediction"),
    ).orderBy("l_orderkey", "l_linenumber").limit(100)


@register(
    "ann_pq_topk",
    None,
    doc="training-data ext (rows-only): product-quantization ANN — seeded "
        "per-subvector codebooks, ADC code-word scan, exact rerank of the "
        "shortlist (operators/similarity.pq_*); recall vs the exact "
        "baseline is pinned in tests/test_operators.py",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_encode, pq_topk_rerank, pq_train_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb = pq_train_codebooks(emb, dim=64, n_subvectors=16, n_codes=32, sample_rows=512)
    codes = pq_encode(emb, cb)
    return pq_topk_rerank(emb, codes, queries, cb, k=10, shortlist_factor=8)


@register(
    "approx_aggregates",
    None,
    doc="§2.4 (rows-only): sketch-based approximate aggregates — "
        "approx_count_distinct (HyperLogLog++) and percentile_approx "
        "(KLL-style) beside their exact counterparts with relative-error "
        "columns; sketches are engine-private so no SQL oracle, error "
        "bounds pinned in tests/test_analytics_quality.py",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # countDistinct is aggregated SEPARATELY and crossed back as a 1-row
    # anchor: mixing a DISTINCT aggregate with the sketch/percentile
    # buffers triggers Spark's distinct-EXPAND rewrite (every row
    # duplicated per distinct group, sketches fed null-padded rows) —
    # measured 4.5 s vs 0.6 s for this split at sf0.1 (r11)
    sketches = o.agg(
        # rsd is a ~1σ relative error dial (more precision = bigger
        # sketch); 2% keeps the estimate inside ±6% with 3σ headroom
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.expr("percentile_approx(o_totalprice, 0.5)").alias("approx_median"),
        F.expr(
            "percentile(o_totalprice, 0.5)"
        ).alias("exact_median"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_custs"))
    agg = sketches.crossJoin(F.broadcast(exact)).select(
        "approx_custs", "exact_custs", "approx_median", "exact_median"
    )
    return agg.select(
        "*",
        (F.abs(F.col("approx_custs") - F.col("exact_custs"))
         / F.col("exact_custs")).alias("cust_rel_err"),
        (F.abs(F.col("approx_median") - F.col("exact_median"))
         / F.col("exact_median")).alias("median_rel_err"),
    )


@register(
    "ann_ivfpq_topk",
    None,
    doc="training-data ext (rows-only): IVF-PQ composite ANN — KMeans "
        "coarse prune (n_probe/n_cells scan fraction) × PQ code scan × "
        "exact rerank (operators/similarity.ivfpq_topk); recall "
        "composition pinned in tests/test_operators.py",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivfpq_topk(emb, queries, dim=64, k=10, n_cells=8, n_probe=4)


@register(
    "image_phash_dedup",
    None,
    doc="training-data ext (rows-only): perceptual-hash IMAGE dedup — "
        "deterministic pseudo-random payloads (exact + perturbed "
        "duplicates planted every 20 ids; even ids encode PNG via the "
        "stdlib-zlib codec, odd ids PPM, so every planted pair ALSO pins "
        "cross-format decode parity) are decoded and 63-bit "
        "average-hashed per partition (operators/multimodal.phash_images, "
        "only the 8-byte hash shuffles), then Hamming-near pairs come from "
        "the same 4×16-bit pigeonhole blocking as text SimHash "
        "(operators/dedup.hamming_near_pairs). Planted pairs are recovered "
        "exactly; unrelated images don't collide",
)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.dedup import hamming_near_pairs
    from ..operators.multimodal import encode_png, encode_ppm, phash_images

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # single-file scan is ONE partition; the per-doc Python codec work
    # below inherits that layout without this (bench --all: phash dedup
    # decoded 5k images serially)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def synth(batches):
        # deterministic pseudo-random 32×32 RGB per doc (content-stable,
        # no RNG); ids ≡ 1 (mod 20) duplicate id-1 exactly, ids ≡ 11
        # (mod 20) duplicate id-1 with two 4×4 blocks swapped — a 4×4
        # block IS one phash grid cell and the swap preserves the grid
        # mean exactly, so the planted near-dup is structurally within
        # Hamming ≤ 2 (only the two swapped cells' bits can change)
        idx = np.arange(32 * 32 * 3, dtype=np.uint64)
        M1, M2, M3 = (np.uint64(0x9E3779B97F4A7C15),
                      np.uint64(0xBF58476D1CE4E5B9),
                      np.uint64(0x94D049BB133111EB))
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                base = d - 1 if d % 10 == 1 else d
                # splitmix-style vectorized scramble: statistically
                # independent pixels per doc (a plain gradient + doc
                # offset only shifts images by a constant mod 256 —
                # docs 256 apart would be identical)
                with np.errstate(over="ignore"):
                    x = idx * M1 + np.uint64(base) * M2
                    x ^= x >> np.uint64(31)
                    x *= M3
                    x ^= x >> np.uint64(29)
                img = (x & np.uint64(0xFF)).astype(np.uint8).reshape(32, 32, 3)
                if d % 20 == 11:  # near-dup: swap grid cells (0,0)↔(1,1)
                    a = img[:4, :4, :].copy()
                    img[:4, :4, :] = img[4:8, 4:8, :]
                    img[4:8, 4:8, :] = a
                # even ids PNG (zlib codec, Paeth-filtered), odd ids PPM:
                # every planted dup pair spans formats, so the query
                # recovering them pins PNG↔PPM decode parity end-to-end
                enc = encode_png(img, filter_type=4) if d % 2 == 0 else encode_ppm(img)
                out.append((str(d), "image", enc))
            yield pd.DataFrame(out, columns=["media_id", "kind", "content"])

    media = docs.mapInPandas(
        synth, "media_id string, kind string, content binary"
    )
    hashes = phash_images(media)
    pairs = hamming_near_pairs(hashes, "media_id", "phash", max_hamming=3)
    return pairs.agg(
        F.count("*").alias("pairs"),
        F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0))
        .cast("long")
        .alias("exact_pairs"),
        F.sum(F.when(F.col("hamming") > 0, 1).otherwise(0))
        .cast("long")
        .alias("near_pairs"),
        F.max("hamming").alias("max_hamming"),
    )


@register(
    "dedup_semantic",
    None,
    doc="training-data ext (rows-only): SemDeDup — KMeans-clustered "
        "embeddings, within-cluster cosine pairs, connected-component "
        "collapse to canonical ids (operators/similarity.semantic_dedup); "
        "catches meaning-level duplicates MinHash/SimHash can't (KMeans "
        "is not SQL-expressible; single-cell == brute-force equivalence "
        "and cell-blocking subset/recall are pinned in tests). Threshold "
        "0.35 is fixture-tuned (synthetic embeddings top out at cos 0.51; "
        "production corpora use 0.9+ — the mechanics are identical)",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.35, n_cells=8)


@register(
    "dedup_incremental_batch",
    None,
    doc="training-data ext (rows-only): daily-ingest dedup — the last 20% "
        "of documents arrive as a batch against a corpus of the first 80%, "
        "whose only materialized artifact is its persisted LSH band index "
        "(operators/dedup.minhash_band_index). Corpus text is touched "
        "only for band-colliding candidates; contaminated batch docs drop "
        "after exact verification, within-batch clusters collapse to "
        "canonicals. Wiring pinned against brute-force cross/batch "
        "jaccard + union-find in tests; returns survivor count + id "
        "bounds (deterministic)",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_incremental, minhash_band_index

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # lazy 80/20 split (no builder-side action): ids are dense enough at
    # every SF that the modulo split is a stable one-in-five batch
    corpus = docs.filter(F.pmod("doc_id", F.lit(5)) != 4)
    batch = docs.filter(F.pmod("doc_id", F.lit(5)) == 4)
    index = minhash_band_index(corpus)
    out = dedup_incremental(batch, corpus, index, threshold=0.8)
    return out.agg(
        F.count("*").cast("long").alias("survivors"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "audio_spectrogram_stats",
    None,
    doc="training-data ext (rows-only): REAL audio DSP — deterministic "
        "PCM WAV payloads (one multi-tone clip per doc_id, stdlib "
        "encode) are decoded and Hann-windowed STFT power spectrograms "
        "computed per partition (operators/multimodal.stft_power — "
        "pinned against a direct O(n^2) DFT in tests); per-clip "
        "spectral descriptors (centroid/bandwidth/flatness/8-band "
        "energy) aggregate by dominant band. Only ~100 bytes/clip "
        "shuffle — the blob never leaves its partition (FFT is not "
        "SQL-expressible; kernel exactness is pinned in pytest)",
)
def audio_spectrogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import audio_spectrograms, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # single-file scan is ONE partition; the per-doc WAV synth + STFT below
    # would otherwise run serially on one core (CLAUDE.md 1-partition
    # scan-layout pitfall, caught by bench --all)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def synth(batches):
        # one 0.25 s 16 kHz clip per doc: a doc-keyed fundamental in
        # [200, 7800) Hz plus a quieter fixed 1 kHz tone (no RNG)
        rate, n = 16000, 4000
        t = np.arange(n, dtype=np.float64) / rate
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                f0 = 200.0 + (d * 997) % 7600
                x = np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(
                    2 * np.pi * 1000.0 * t
                )
                samples = np.round(x / 1.3 * 30000).astype(np.int16)
                out.append((str(d), "audio", bytearray(encode_wav(samples, rate))))
            yield pd.DataFrame(out, columns=["media_id", "kind", "content"])

    media = docs.mapInPandas(
        synth, "media_id string, kind string, content binary"
    )
    specs = audio_spectrograms(media)
    return (
        specs.groupBy("dominant_band")
        .agg(
            F.count("*").cast("long").alias("clips"),
            F.avg("centroid_hz").alias("avg_centroid_hz"),
            F.avg("flatness").alias("avg_flatness"),
        )
        .orderBy("dominant_band")
    )


@register(
    "video_keyframe_dedup",
    None,
    doc="training-data ext (rows-only): REAL compressed-VIDEO dedup — "
        "every 10th doc_id becomes a raw motion-JPEG clip (4 baseline-"
        "JPEG frames, two 2-frame scenes; operators/multimodal."
        "encode_mjpeg), ids ≡ 10 (mod 100) replaying the previous "
        "clip byte-for-byte. Clips decode per partition "
        "(video_frame_phashes: only 12 bytes/frame shuffle), shot-"
        "boundary keyframes come from a per-clip lag window, and whole-"
        "video duplicates collapse on the keyframe-sequence "
        "fingerprint. Planted dup recovery + codec round-trip pinned "
        "in tests/test_multimodal_video.py",
)
def video_keyframe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        encode_mjpeg,
        video_frame_phashes,
        video_keyframes,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 0)
    )
    # single-file scan is ONE partition; the per-clip JPEG encode/decode
    # below would otherwise run serially on one core (CLAUDE.md
    # 1-partition scan-layout pitfall, caught by bench --all)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def synth(batches):
        # two 2-frame scenes of deterministic pseudo-random 24×24 RGB
        # (splitmix scramble, same recipe as image_phash_dedup); ids
        # ≡ 10 (mod 100) rebuild the PREVIOUS selected doc's clip, so
        # the planted duplicate is byte-identical end to end
        idx = np.arange(24 * 24 * 3, dtype=np.uint64)
        M1, M2, M3 = (np.uint64(0x9E3779B97F4A7C15),
                      np.uint64(0xBF58476D1CE4E5B9),
                      np.uint64(0x94D049BB133111EB))

        def scene(seed: int) -> np.ndarray:
            with np.errstate(over="ignore"):
                x = idx * M1 + np.uint64(seed) * M2
                x ^= x >> np.uint64(31)
                x *= M3
                x ^= x >> np.uint64(29)
            return (x & np.uint64(0xFF)).astype(np.uint8).reshape(24, 24, 3)

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                base = d - 10 if d % 100 == 10 else d
                a, b = scene(base * 2), scene(base * 2 + 1)
                clip = encode_mjpeg([a, a, b, b])
                out.append((str(d), "video", clip))
            yield pd.DataFrame(out, columns=["media_id", "kind", "content"])

    media = docs.mapInPandas(
        synth, "media_id string, kind string, content binary"
    )
    kf = video_keyframes(video_frame_phashes(media), max_hamming=2)
    # keyframe-sequence fingerprint per video (order-sensitive), then
    # collapse exact-duplicate videos on it
    fp = kf.groupBy("media_id").agg(
        F.count("*").alias("n_keyframes"),
        F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("frame_idx", "phash"))),
                    lambda s: s["phash"].cast("string"),
                ),
            )
        ).alias("video_fp"),
    )
    per_fp = fp.groupBy("video_fp").agg(
        F.count("*").alias("n_videos"),
        F.max("n_keyframes").alias("kf"),
    )
    return per_fp.agg(
        F.count("*").cast("long").alias("distinct_videos"),
        F.sum("n_videos").cast("long").alias("total_videos"),
        F.sum(F.when(F.col("n_videos") > 1, F.col("n_videos") - 1).otherwise(0))
        .cast("long")
        .alias("dup_videos_removable"),
        F.sum(F.col("kf") * F.col("n_videos")).cast("long").alias("total_keyframes"),
    )


@register(
    "video_crossclip_dedup",
    None,
    doc="training-data ext (rows-only): CROSS-CLIP temporal video "
        "dedup — the copy-detection stage over real MJPEG clips "
        "(r8 verdict stretch task). Every 10th doc_id becomes a 3-scene "
        "x 2-frame clip of smooth sinusoid-gradient scenes (low-"
        "frequency content, so phash survives re-encoding); ids "
        "≡ 10 (mod 100) replay the previous clip BYTE-identically and "
        "ids ≡ 20/70 (mod 100) re-encode the previous clip's scenes at "
        "JPEG quality 70 vs 85 (same content, different bytes — the "
        "re-upload case byte-level dedup can't see). Keyframe phashes "
        "-> 16-bit-block pigeonhole candidate join -> offset-aligned "
        "verification (operators/multimodal.crossclip_segment_pairs); "
        "only hash rows shuffle. Planted exact+re-encoded recovery "
        "pinned in tests/test_multimodal_video.py",
)
def video_crossclip_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        crossclip_segment_pairs,
        encode_mjpeg,
        video_frame_phashes,
        video_keyframes,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 0)
    )
    # single-file scan is ONE partition; the per-clip JPEG encode/decode
    # below would otherwise run serially on one core (CLAUDE.md
    # scan-layout pitfall)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def synth(batches):
        yy, xx = np.mgrid[0:24, 0:24]

        def _mix(s: int) -> int:  # splitmix64 finalizer
            s = (s * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            s ^= s >> 31
            s = (s * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            s ^= s >> 29
            return s

        def scene(seed: int) -> np.ndarray:
            # smooth per-channel sinusoid gradients with CONTINUOUS
            # hash-derived parameters (distinct seeds -> distinct
            # patterns; a mod-quantized first cut collided across seeds
            # and flooded the fixture with unplanned true dups):
            # low-frequency DCT mass keeps the 63-bit phash within a few
            # bits between JPEG quality 70 and 85 (noise scenes are
            # re-encode-unstable)
            img = np.zeros((24, 24, 3), dtype=np.uint8)
            for c in range(3):
                h = _mix(seed * 4 + c + 1)
                fx = 0.4 + (h & 0xFFFF) / 65536.0 * 2.6
                fy = 0.4 + ((h >> 16) & 0xFFFF) / 65536.0 * 2.6
                ph = ((h >> 32) & 0xFFFF) / 65536.0 * 2 * np.pi
                img[..., c] = np.round(
                    127.5
                    + 120.0
                    * np.sin(2 * np.pi * (fx * xx / 24 + fy * yy / 24) + ph)
                ).astype(np.uint8)
            return img

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 100 == 10:  # byte-identical replay of d-10
                    base, quality = d - 10, 85
                elif d % 50 == 20:  # same scenes, re-encoded at q70 —
                    # resolve through the replay rule so the plant
                    # points at the clip CONTENT of d-10, not its id
                    b = d - 10
                    base = b - 10 if b % 100 == 10 else b
                    quality = 70
                else:
                    base, quality = d, 85
                scenes = [scene(base * 3 + j) for j in range(3)]
                clip = encode_mjpeg(
                    [s for s in scenes for _ in range(2)], quality=quality
                )
                out.append((str(d), "video", clip))
            yield pd.DataFrame(out, columns=["media_id", "kind", "content"])

    media = docs.mapInPandas(
        synth, "media_id string, kind string, content binary"
    )
    kf = video_keyframes(video_frame_phashes(media), max_hamming=2)
    pairs = crossclip_segment_pairs(kf, max_hamming=6, min_aligned=2)
    return (
        pairs.withColumn(
            "dup_kind",
            F.when(F.col("mean_hamming") == 0.0, F.lit("exact"))
            .otherwise(F.lit("near")),
        )
        .groupBy("dup_kind")
        .agg(
            F.count("*").cast("long").alias("clip_pairs"),
            F.sum("aligned_keyframes").cast("long").alias("aligned_keyframes"),
            F.avg("mean_hamming").alias("avg_hamming"),
        )
        .orderBy("dup_kind")
    )


@register(
    "text_compression_signal",
    None,
    doc="training-data ext (rows-only): deflate-compressibility quality "
        "signal — zlib level-6 compressed size / raw size per doc (the "
        "CCNet/RefinedWeb-style heuristic: highly compressible text is "
        "repetitive/templated, incompressible text is noise). Ratios are "
        "fixed-point micro-units (exact-integer aggregation), profiled "
        "per source with a flag count for the extreme tails. zlib is not "
        "SQL-expressible; per-doc values + partition invariance pinned "
        "in tests/test_text_compression.py",
)
def text_compression_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    import zlib

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # single-file scan is ONE partition; the per-doc deflate below would
    # otherwise run serially on one core (CLAUDE.md scan-layout pitfall)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def ratios(batches):
        for pdf in batches:
            raw = [t.encode("utf-8") for t in pdf["text"]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "source": pdf["source"].values,
                    "raw_bytes": [len(b) for b in raw],
                    # exact integer micro-ratio: no doubles shuffle
                    "ratio_micro": [
                        (c * 1_000_000) // max(r, 1)
                        for c, r in zip(comp, (len(b) for b in raw))
                    ],
                }
            )

    r = docs.mapInPandas(
        ratios, "doc_id long, source string, raw_bytes long, ratio_micro long"
    )
    return (
        r.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            (F.sum("ratio_micro").cast("double") / F.lit(1_000_000.0) / F.count("*"))
            .alias("avg_ratio"),
            (F.min("ratio_micro").cast("double") / F.lit(1_000_000.0)).alias("min_ratio"),
            (F.max("ratio_micro").cast("double") / F.lit(1_000_000.0)).alias("max_ratio"),
            F.sum(F.when(F.col("ratio_micro") < 300_000, 1).otherwise(0))
            .cast("long")
            .alias("highly_compressible"),
        )
        .orderBy("source")
    )
