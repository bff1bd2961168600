"""Scale-path operator tests: dedup (exact/MinHash-LSH/SimHash),
similarity (brute-force + LSH ANN), text features, multimodal plumbing,
top-k."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nyc_taxi_bigdata_pipeline_spark.operators import (
    dedup,
    multimodal,
    packing,
    sampling,
    similarity,
    text,
    topk,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Corpus + exact dups + near-dups (one-token edits) with known ids."""
    base = docs.limit(50)
    exact = base.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    near = (
        base.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzquux")))
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(docs_with_dups):
    stats = dedup.dedup_stats(docs_with_dups).first()
    assert stats["total"] == 60
    assert stats["dups"] == 5  # the 5 exact copies
    deduped = dedup.exact_dedup(docs_with_dups)
    assert deduped.count() == 55


def test_minhash_lsh_finds_near_dups(docs_with_dups):
    pairs = dedup.minhash_dedup(
        docs_with_dups, num_hashes=16, bands=8, threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # every exact dup pair must be found (jaccard 1.0)
    for i in range(5):
        doc = docs_with_dups.orderBy("doc_id").limit(5).collect()[i]["doc_id"]
        assert (doc, doc + 100000) in found
    # near-dup pairs (one appended token) should also surface
    near_hits = [p for p in found if p[1] >= 200000 and p[1] - 200000 == p[0]]
    assert len(near_hits) >= 3
    for r in pairs:
        assert 0.0 <= r["jaccard"] <= 1.0


def test_lsh_bucket_cap_bounds_pathological_duplication(spark, docs):
    """10k identical docs land in ONE bucket per band; without the cap
    that is C(10k,2) ≈ 50M candidate pairs per band. The representative-
    star fallback must keep the pair count linear and the run fast."""
    import time

    boiler = (
        spark.range(10_000)
        .select(
            (F.col("id") + 500_000).alias("doc_id"),
            F.lit("exactly the same boilerplate text repeated in every document").alias("text"),
        )
    )
    corpus = docs.limit(200).select("doc_id", "text").unionByName(boiler)
    t0 = time.monotonic()
    sigs = dedup.add_minhash(corpus, num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=8, bucket_cap=64)
    n_pairs = pairs.count()
    elapsed = time.monotonic() - t0
    # star pairs: 9,999 for the boilerplate bucket (+ any organic pairs
    # among the 200 real docs, bounded by C(200,2))
    assert n_pairs < 10_000 + 200 * 199 // 2
    assert elapsed < 120
    # connectivity preserved: every boilerplate doc links to the rep
    rep_pairs = pairs.filter(F.col("id_b") >= 500_000).count()
    assert rep_pairs == 9_999
    # verified pairs confirm at jaccard 1.0 through the full pipeline
    verified = dedup.jaccard_verify(
        pairs.filter(F.col("id_b") >= 500_001).limit(50), corpus
    )
    assert verified.filter(F.col("jaccard") < 1.0).count() == 0


def test_dedup_clusters_and_canonical(spark, docs_with_dups):
    """Pairs → connected components → canonical-doc corpus: the full
    near-dup removal chain. Chained pairs (a-b, b-c) must land in ONE
    cluster even though (a, c) was never a candidate pair."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    clusters = {r["doc_id"]: r["cluster"] for r in dedup.dedup_clusters(pairs).collect()}
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[10] == clusters[11] == 10
    assert clusters[20] == clusters[21] == clusters[22] == clusters[23] == 20
    # end-to-end with real LSH pairs: exact dups collapse to one survivor
    found = dedup.minhash_dedup(docs_with_dups, num_hashes=16, bands=8, threshold=0.99)
    kept = dedup.keep_canonical(docs_with_dups, found)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert len(kept_ids) < docs_with_dups.count()  # something was removed
    base_ids = [r["doc_id"] for r in docs_with_dups.orderBy("doc_id").limit(5).collect()]
    for doc in base_ids:
        assert doc in kept_ids  # canonical (min id) survives
        assert doc + 100000 not in kept_ids  # its exact copy does not


def test_dedup_clusters_small_graph_cap_equivalence(spark):
    """r11 `small_graph_cap` driver-side union-find must equal the
    distributed min-label loop exactly — adversarial shapes: long chain
    (tests transitive depth), star, cycle, cross-edges arriving in
    max-first order (tests union-by-min-root), self-contained cliques."""
    edges = (
        [(i, i + 1) for i in range(1, 9)]            # chain 1..9
        + [(50, 51), (50, 52), (50, 53)]             # star
        + [(60, 61), (61, 62), (62, 60)]             # cycle
        + [(99, 70), (98, 70), (97, 98)]             # max-first unions
        + [(80, 81), (81, 80)]                       # duplicate both ways
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    loop = {
        (r["doc_id"], r["cluster"])
        for r in dedup.dedup_clusters(pairs, max_iter=20).collect()
    }
    uf = {
        (r["doc_id"], r["cluster"])
        for r in dedup.dedup_clusters(pairs, small_graph_cap=10_000).collect()
    }
    assert uf == loop
    # cap below the edge count → falls through to the distributed loop
    tiny = {
        (r["doc_id"], r["cluster"])
        for r in dedup.dedup_clusters(pairs, small_graph_cap=2).collect()
    }
    assert tiny == loop


def test_containment_asymmetric_subset(spark):
    """A doc that is a strict prefix of a longer doc: containment finds
    the src→dst direction at 1.0, NOT the reverse, and the symmetric
    Jaccard join misses the pair entirely (union-normalized similarity
    |S_A|/|S_B| is far below threshold) — the semantics that justify the
    operator's existence."""
    long_text = " ".join(f"tok{i:03d}" for i in range(80))
    short_text = " ".join(f"tok{i:03d}" for i in range(20))
    other = " ".join(f"oth{i:03d}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short_text), (2, long_text), (3, other)], "doc_id long, text string"
    )
    out = dedup.containment_join_prefix(df, threshold=0.8, shingle_n=14).collect()
    pairs = {(r.src_id, r.dst_id): r.containment for r in out}
    assert pairs[(1, 2)] == 1.0  # every 14-gram of the prefix is in the long doc
    assert (2, 1) not in pairs  # reverse direction well below 0.8
    assert not any(3 in p for p in pairs)  # disjoint vocab never collides
    jac = dedup.jaccard_join_prefix(df, threshold=0.8, shingle_n=14).collect()
    assert jac == []  # the subset pair is invisible to symmetric Jaccard


def test_simhash_near_pairs(docs_with_dups):
    pairs = dedup.simhash_near_pairs(docs_with_dups, max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    base_ids = [r["doc_id"] for r in docs_with_dups.orderBy("doc_id").limit(5).collect()]
    for doc in base_ids:
        assert (doc, doc + 100000) in found  # exact dups at Hamming 0
    hams = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for doc in base_ids:
        assert hams[(doc, doc + 100000)] == 0


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_cosine_topk_matches_registry_oracle(spark, sf_dir, emb):
    """The numpy scale path must agree with the oracle-checked
    expression flavor (same data, same k) up to float tolerance."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY

    queries = emb.filter(F.col("vec_id") < 5)
    got = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    want = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cos_sim"])
        for r in REGISTRY["similarity_knn_bruteforce"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for key, (nid, sim) in want.items():
        gnid, gsim = got[key]
        assert abs(gsim - sim) < 1e-5
        # ids can differ only on rounded-cosine ties
        if gnid != nid:
            assert abs(gsim - sim) < 2e-6


def test_ann_lsh_recall(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(emb, queries, k=10)
    # the synthetic embeddings are near-uniform on the sphere, so recall
    # tracks the probed-bucket fraction: 4 planes + radius-2 multiprobe
    # probes 11/16 buckets → measured recall ≈ 0.76
    approx = similarity.ann_topk_lsh(
        emb, queries, dim=64, k=10, num_planes=4, probe_radius=2
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5
    assert all(-1.001 <= r["cos_sim"] <= 1.001 for r in approx.collect())
    # multiprobe must not duplicate (query, neighbor) pairs
    n = approx.count()
    assert n == approx.select("query_id", "neighbor_id").distinct().count()


def test_hyperplane_buckets_match_unrolled_sql(emb):
    """The O(1)-size zip_with dot product must reproduce the unrolled
    per-dimension SQL chain bit-for-bit (same left-to-right float adds)."""
    import numpy as np

    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 64))
    terms = []
    for p in range(8):
        dot = " + ".join(
            f"CAST(element_at(embedding, {i + 1}) AS DOUBLE) * ({float(planes[p, i])!r})"
            for i in range(64)
        )
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END)")
    legacy = emb.limit(200).withColumn(
        "legacy_bucket", F.expr(" + ".join(terms)).cast("long")
    )
    got = similarity.random_hyperplane_buckets(legacy, dim=64).collect()
    assert len(got) == 200
    assert all(r["lsh_bucket"] == r["legacy_bucket"] for r in got)


def test_ann_lsh_dim_768(spark):
    """Real embedding dims must not hit codegen/expression-size limits —
    the unrolled form broke past dim ≈ 500; the zip_with form is O(1)."""
    import numpy as np

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((300, 768)).astype(float)
    rows = [(i, mat[i].tolist()) for i in range(300)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = similarity.random_hyperplane_buckets(corpus, dim=768, num_planes=8)
    buckets = [r["lsh_bucket"] for r in b.select("lsh_bucket").collect()]
    assert all(0 <= x < 256 for x in buckets)
    assert len(set(buckets)) > 1  # actually spreads
    queries = corpus.filter(F.col("vec_id") < 3)
    out = similarity.ann_topk_lsh(
        corpus, queries, dim=768, k=5, num_planes=8, probe_radius=1
    ).collect()
    assert len(out) > 0
    assert all(-1.001 <= r["cos_sim"] <= 1.001 for r in out)
    assert all(r["rn"] <= 5 for r in out)


def test_arrow_cosine_matches_interpreted_fold(spark, monkeypatch):
    """At dim ≥ ARROW_COSINE_MIN_DIM the candidate-verify cosine runs as
    an Arrow/numpy kernel instead of the interpreted zip_with fold. Both
    routes must nominate the SAME neighbors in the SAME order (sims agree
    to float tolerance; ranking ties are broken by neighbor_id either
    way)."""
    import numpy as np

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((200, 768)).astype(float)
    corpus = spark.createDataFrame(
        [(i, mat[i].tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") < 3)

    def run():
        return {
            (r["query_id"], r["rn"]): (r["neighbor_id"], r["cos_sim"])
            for r in similarity.ann_topk_lsh(
                corpus, queries, dim=768, k=5, num_planes=4, probe_radius=1
            ).collect()
        }

    arrow = run()
    monkeypatch.setattr(similarity, "ARROW_COSINE_MIN_DIM", 10**9)  # force fold
    fold = run()
    assert set(arrow) == set(fold)
    for key, (nid, sim) in fold.items():
        anid, asim = arrow[key]
        assert abs(asim - sim) < 1e-9
        if anid != nid:  # only explicable by a float-tie rank swap
            assert abs(asim - sim) < 1e-9


def test_ivf_topk_recall_and_dial(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    # probing ALL cells must recover exact search (recall 1.0)
    full = similarity.ivf_topk(emb, queries, k=10, n_cells=8, n_probe=8)
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == exact
    # probing a fraction trades recall for scan cost, monotonically
    part = similarity.ivf_topk(emb, queries, k=10, n_cells=8, n_probe=3)
    p = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    recall = len(exact & p) / len(exact)
    assert 0.2 <= recall <= 1.0
    assert len(p) <= len(f)


def test_ann_recall_curve(emb):
    """Pins the recall-vs-scan-fraction dial (RESULTS.md table) so index
    changes can't silently regress it. Measured at sf0.01: LSH radius
    0/1/2 → 0.16/0.42/0.79; IVF n_probe 1/4/8 → 0.34/0.78/1.00."""
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }

    def lsh_recall(radius):
        a = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ann_topk_lsh(
                emb, queries, dim=64, k=10, num_planes=4, probe_radius=radius
            ).collect()
        }
        return len(exact & a) / len(exact)

    def ivf_recall(probe):
        p = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(emb, queries, k=10, n_cells=8, n_probe=probe).collect()
        }
        return len(exact & p) / len(exact)

    r0, r1, r2 = lsh_recall(0), lsh_recall(1), lsh_recall(2)
    assert r0 <= r1 <= r2  # more probes never hurt
    assert r2 >= 0.6  # measured 0.79; wide margin against plan changes
    i1, i4, i8 = ivf_recall(1), ivf_recall(4), ivf_recall(8)
    assert i1 <= i4 <= i8
    assert i4 >= 0.6  # measured 0.78
    assert i8 == 1.0  # probing every cell IS exact search


def test_text_features(docs):
    out = text.with_text_features(docs.limit(100))
    rows = out.select("n_tokens", "punct_ratio", "stopword_ratio", "quality_score",
                      "fingerprint").collect()
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0 <= r["quality_score"] <= 3
    # fingerprint is deterministic: same input → same hash
    f1 = out.select("fingerprint").collect()
    f2 = text.with_text_features(docs.limit(100)).select("fingerprint").collect()
    assert f1 == f2


def test_tfidf_vectors_and_knn(docs):
    vecs, idf_model = text.tfidf_vectors(docs.limit(100), num_features=1 << 10)
    assert "tfidf" in vecs.columns
    first = vecs.select("tfidf").first()[0]
    assert first.size == 1 << 10 and first.numNonzeros() > 0
    # IDF model reusable on new data with identical weights
    again, _ = text.tfidf_vectors(docs.limit(100), num_features=1 << 10)
    assert again.select("tfidf").first()[0].toArray().tolist() == first.toArray().tolist()
    knn = text.tfidf_knn(vecs, k=3, n_queries=3).collect()
    by_q = {}
    for r in knn:
        by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
    assert all(len(v) == 3 for v in by_q.values())
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)
        assert all(-1.001 <= s <= 1.001 for s in sims)


def test_multimodal_plumbing(spark):
    rows = [
        ("img1", "image", b"\x01\x02\x03\x04" * 64, 640, 480, None, "png"),
        ("img2", "image", b"\xff\xee" * 100, 800, 600, None, "jpg"),
        ("vid1", "video", b"\x00" * 32, None, None, 3500, "mp4"),
        ("aud1", "audio", None, None, None, 2000, "wav"),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r["features"] for r in feats}
    assert len(by_id["img1"]) == multimodal.FEATURE_DIM
    assert by_id["aud1"] == [0.0] * multimodal.FEATURE_DIM  # null payload
    # deterministic fake decoder
    assert by_id["img1"] == multimodal.default_fake_decoder(rows[0][2]).tolist()
    # real decoder is an explicit stub
    with pytest.raises(NotImplementedError):
        multimodal.real_decoder_unavailable(b"x")
    frames = multimodal.frame_sample_plan(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_ppm_wav_roundtrip():
    """Stdlib codecs: encode → decode recovers the exact pixel/sample
    arrays (PPM header variations with comments included)."""
    import numpy as np

    img = (np.arange(8 * 6 * 3, dtype=np.uint64) % 256).astype(np.uint8).reshape(8, 6, 3)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    # comment + multi-whitespace header, per netpbm spec
    with_comment = b"P6\n# made by a test\n6 8\n255\n" + img.tobytes()
    assert (multimodal.decode_ppm(with_comment) == img).all()

    t = np.arange(3200)
    samples = ((t * 37) % 2048 - 1024).astype(np.int16)
    dec, rate = multimodal.decode_wav(multimodal.encode_wav(samples, rate=8000))
    assert rate == 8000
    assert np.allclose(dec * 32768.0, samples)


def test_media_decoder_real_decode_in_spark(spark):
    """End-to-end real decode through the Arrow plumbing: PPM and WAV
    payloads built driver-side, decoded distributed, features equal the
    locally computed kernels; compressed formats still raise."""
    import numpy as np

    img = ((np.arange(16 * 16 * 3) * 7) % 256).astype(np.uint8).reshape(16, 16, 3)
    samples = ((np.arange(1600) * 91) % 4096 - 2048).astype(np.int16)
    rows = [
        ("ppm1", "image", multimodal.encode_ppm(img), 16, 16, None, "ppm"),
        ("jpg1", "image", multimodal.encode_jpeg(img, 95), 16, 16, None, "jpeg"),
        ("wav1", "audio", multimodal.encode_wav(samples), None, None, 100, "wav"),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(
            media, decoder=multimodal.media_decoder
        ).collect()
    }
    assert feats["ppm1"] == multimodal.image_features(img).tolist()
    assert feats["wav1"] == multimodal.audio_features(
        *multimodal.decode_wav(multimodal.encode_wav(samples))
    ).tolist()
    assert len(feats["ppm1"]) == multimodal.FEATURE_DIM
    assert len(feats["wav1"]) == multimodal.FEATURE_DIM
    # luminance quadrants + histogram are genuine image statistics
    assert 0.0 < feats["ppm1"][6] < 1.0
    assert abs(sum(feats["ppm1"][12:16]) - 1.0) < 1e-9
    # JPEG decodes for real now — features computed from its own decode
    assert feats["jpg1"] == multimodal.image_features(
        multimodal.decode_jpeg(multimodal.encode_jpeg(img, 95))
    ).tolist()
    # externally-coded video is still the honest stub
    with pytest.raises(NotImplementedError):
        multimodal.media_decoder(b"\x00\x00\x00\x18ftypmp42 video-ish")


def test_hll_sketch_accuracy(spark, sf_dir):
    """The engine-exact HLL must actually estimate well: per event_type
    the estimate lands within 25% of the true distinct count (m=256 →
    ~6.5% standard error; 25% is ~4σ), and registers are all integer
    state (reg_sum exact BIGINT)."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY

    rows = REGISTRY["hll_distinct_by_type"].spark_fn(spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r["n_distinct"] > 0
        err = abs(r["hll_estimate"] - r["n_distinct"]) / r["n_distinct"]
        assert err < 0.25, (r["event_type"], r["hll_estimate"], r["n_distinct"])
        assert isinstance(r["reg_sum"], int) and r["reg_sum"] > 0


def test_deterministic_splits_and_samples(spark, docs):
    d = docs.limit(400).select("doc_id", "text")
    s1 = sampling.with_split(d)
    # stable across runs AND repartitioning
    s2 = sampling.with_split(d.repartition(13))
    m1 = {r["doc_id"]: r["split"] for r in s1.collect()}
    m2 = {r["doc_id"]: r["split"] for r in s2.collect()}
    assert m1 == m2
    counts = {r["split"]: r["count"] for r in s1.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]  # ~80/10/10
    # disjoint + exhaustive
    assert sum(counts.values()) == 400

    samp = sampling.deterministic_sample(d, 0.1)
    again = sampling.deterministic_sample(d.repartition(5), 0.1)
    ids = sorted(r["doc_id"] for r in samp.collect())
    assert ids == sorted(r["doc_id"] for r in again.collect())
    assert 10 <= len(ids) <= 90  # ~40 expected of 400

    strat = sampling.with_split(d).withColumnRenamed("split", "stratum")
    sub = sampling.stratified_deterministic_sample(
        strat, "stratum", {"train": 0.1, "test": 1.0}
    )
    got = {r["stratum"] for r in sub.select("stratum").distinct().collect()}
    assert got == {"train", "test"}  # 'val' dropped (absent from fractions)
    n_test_before = strat.filter(F.col("stratum") == "test").count()
    assert sub.filter(F.col("stratum") == "test").count() == n_test_before


def test_sequence_packing(spark, docs):
    d = docs.limit(300).select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).alias("n_tokens")
    )
    packed = packing.with_pack_chunks(d, "n_tokens", context_len=256, n_shards=4)
    rows = packed.collect()
    assert len(rows) == 300
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        # offsets are the running sum of preceding docs' tokens
        expect = 0
        for r in shard_rows:
            assert r["start_offset"] == expect
            assert r["chunk"] == expect // 256
            expect += r["n_tokens"]
    # stable under repartitioning (content-hash shard, id order)
    again = packing.with_pack_chunks(d.repartition(11), "n_tokens", context_len=256, n_shards=4)
    assert {(r["doc_id"], r["chunk"]) for r in again.collect()} == {
        (r["doc_id"], r["chunk"]) for r in rows
    }
    stats = packing.pack_stats(d, "n_tokens", context_len=256, n_shards=4).collect()
    assert sum(r["docs"] for r in stats) == 300
    total_tokens = d.agg(F.sum("n_tokens")).first()[0]
    assert sum(r["total_tokens"] for r in stats) == total_tokens
    for r in stats:
        # a 256-token context over ~54-token docs packs several docs/chunk
        assert r["max_docs_per_chunk"] >= 2
        assert r["chunks_started"] >= r["total_tokens"] // 256


def test_topk_helpers(spark, emb):
    g = topk.grouped_topk(
        emb, ["label"], [F.desc("vec_id")], k=3
    )
    counts = g.groupBy("label").count().collect()
    assert all(r["count"] == 3 for r in counts)
    t = topk.topk(emb.select("vec_id"), [F.desc("vec_id")], 5).collect()
    assert len(t) == 5


def test_pq_adc_and_rerank_recall(emb):
    """PQ codebooks (m=16 × 32 codes over dim 64) + ADC scan, then the
    two-stage rerank. Measured on this data: ADC-only recall ≈ 0.62
    (random vectors are PQ's worst case — no cluster structure), rerank
    ≈ 0.9 at 4× / 0.98 at 8× shortlist. Thresholds leave margin."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    cb = similarity.pq_train_codebooks(
        emb, dim=64, n_subvectors=16, n_codes=32, sample_rows=500
    )
    assert cb.shape == (16, 32, 4)
    codes = similarity.pq_encode(emb, cb).cache()
    # codes are dense small ints: every vector gets m codes in [0, 32)
    row = codes.first()
    assert len(row["codes"]) == 16 and all(0 <= c < 32 for c in row["codes"])

    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk_adc(codes, queries, cb, k=10).collect()
    }
    assert len(adc & exact) / len(exact) >= 0.4

    rr = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.pq_topk_rerank(
            emb, codes, queries, cb, k=10, shortlist_factor=8
        ).collect()
    }
    assert len(rr & exact) / len(exact) >= 0.9
    codes.unpersist()


def test_pq_encode_deterministic(emb):
    """Seeded training + argmax assignment: re-running the whole PQ path
    must reproduce identical codes (required for reproducible indexes)."""
    cb1 = similarity.pq_train_codebooks(
        emb, dim=64, n_subvectors=8, n_codes=16, sample_rows=300
    )
    cb2 = similarity.pq_train_codebooks(
        emb, dim=64, n_subvectors=8, n_codes=16, sample_rows=300
    )
    import numpy as np

    assert np.array_equal(cb1, cb2)
    c1 = {r["vec_id"]: tuple(r["codes"]) for r in similarity.pq_encode(emb, cb1).collect()}
    c2 = {r["vec_id"]: tuple(r["codes"]) for r in similarity.pq_encode(emb, cb2).collect()}
    assert c1 == c2


def test_scd2_multi_update_chain_and_idempotency(spark):
    from nyc_taxi_bigdata_pipeline_spark.operators import scd

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "k long, tier string"
    )
    t = scd.scd2_init(dim, "k", ["tier"], "2020-01-01")

    import datetime as dt

    updates = spark.createDataFrame(
        [
            (1, "platinum", dt.date(2021, 6, 1)),   # real change
            (1, "diamond", dt.date(2022, 1, 1)),    # second version same batch
            (2, "silver", dt.date(2021, 6, 1)),     # no-op: attrs unchanged
        ],
        "k long, tier string, eff_date date",
    )
    out = scd.scd2_apply(t, updates, "k", ["tier"])
    rows = {(r["k"], r["tier"]): r for r in out.collect()}

    # key 1: gold closed at first change, platinum closed at second, diamond open
    assert rows[(1, "gold")]["valid_to"] == dt.date(2021, 6, 1)
    assert not rows[(1, "gold")]["is_current"]
    assert rows[(1, "platinum")]["valid_from"] == dt.date(2021, 6, 1)
    assert rows[(1, "platinum")]["valid_to"] == dt.date(2022, 1, 1)
    assert rows[(1, "diamond")]["is_current"]
    # key 2: no-op update leaves the row open; key 3 untouched
    assert rows[(2, "silver")]["is_current"]
    assert rows[(3, "bronze")]["is_current"]
    # exactly one current row per key, intervals never overlap
    assert out.filter("is_current").count() == 3
    assert out.filter("valid_from >= valid_to").count() == 0

    # idempotency: re-applying the same batch is a no-op (latest version
    # per key now matches the current rows)
    again = scd.scd2_apply(out, updates, "k", ["tier"])
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}


def test_ivfpq_recall_composes(emb):
    """IVF-PQ = coarse prune × code scan × exact rerank. With full probe
    it must recover the PQ+rerank recall; with partial probe recall can
    only drop (the pruned cells are gone for good)."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }

    full = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivfpq_topk(
            emb, queries, dim=64, k=10, n_cells=8, n_probe=8
        ).collect()
    }
    assert len(full & exact) / len(exact) >= 0.9  # PQ+rerank floor

    partial = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivfpq_topk(
            emb, queries, dim=64, k=10, n_cells=8, n_probe=4
        ).collect()
    }
    assert len(partial & exact) / len(exact) >= 0.3
    assert len(partial & exact) <= len(full & exact)


# ---------------------------------------------------- CDC latest-wins merge


def test_apply_cdc_upsert_delete_insert(spark):
    from nyc_taxi_bigdata_pipeline_spark.operators.upsert import apply_cdc

    base = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
        "k bigint, seg string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (1, 5, "U", 11.0),   # stale update...
            (1, 9, "U", 12.0),   # ...overridden by the latest seq
            (2, 7, "D", 0.0),    # delete existing
            (4, 3, "U", 40.0),   # insert brand-new key
            (5, 2, "D", 0.0),    # delete of absent key = no-op
            (4, 1, "D", 0.0),    # stale delete loses to seq-3 upsert
        ],
        "k bigint, seq bigint, op string, bal double",
    )
    out = {r["k"]: r for r in apply_cdc(base, changes, "k").collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["bal"] == 12.0 and out[1]["last_seq"] == 9
    assert out[3]["bal"] == 30.0 and out[3]["last_seq"] == 0  # untouched
    assert out[4]["bal"] == 40.0 and out[4]["seg"] is None    # insert: non-payload NULL


def test_apply_cdc_idempotent_reapply(spark):
    from nyc_taxi_bigdata_pipeline_spark.operators.upsert import apply_cdc

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, bal double")
    changes = spark.createDataFrame(
        [(1, 3, "U", 15.0), (2, 4, "D", 0.0)], "k bigint, seq bigint, op string, bal double"
    )
    once = apply_cdc(base, changes, "k")
    twice = apply_cdc(once.drop("last_seq"), changes, "k")
    assert sorted(r["bal"] for r in twice.collect()) == [15.0]


# ------------------------------------------------- per-key exact-k sampling


def test_per_key_exact_sample(docs):
    k = 7
    sampled = sampling.per_key_exact_sample(docs, "lang", k, key_col="doc_id")
    sizes = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(k, full[lang])
    # deterministic: same rows on re-run, even after repartitioning
    a = {r["doc_id"] for r in sampled.collect()}
    b = {
        r["doc_id"]
        for r in sampling.per_key_exact_sample(
            docs.repartition(7), "lang", k, key_col="doc_id"
        ).collect()
    }
    assert a == b


# ------------------------------------------------------ token rarity


def test_token_rarity_features(spark):
    corpus = spark.createDataFrame(
        [(1, "a a a rare"), (2, "a a a a"), (3, "a a b b")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in text.token_rarity_features(corpus).collect()}
    # corpus: a×9, b×2, rare×1 → total=12, vocab=3, mean=4 → rare iff cnt≤2
    assert out[1]["n_tokens"] == 4 and out[1]["rarest_cnt"] == 1
    assert out[1]["rare_tokens"] == 1
    assert out[2]["rare_tokens"] == 0
    assert out[3]["rare_tokens"] == 2
    assert out[2]["avg_tok_freq"] == 9.0


# ------------------------------------------------------ fixed-point PageRank


def test_pagerank_fixed_point_hand_computed(spark):
    """Tiny graph with hand-derived fixed-point values (scale=100):
    A→B, A→C, B→A unit weights; C dangling. Exact integer semantics —
    any arithmetic drift (float division, rounding instead of
    truncation) breaks these equalities."""
    from nyc_taxi_bigdata_pipeline_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 1), ("B", "A", 1)], "src string, dst string, w bigint"
    )
    r2 = {
        r["n"]: r["r"]
        for r in pagerank_fixed_point(edges, iterations=2, scale=100).collect()
    }
    # iter1: A=15+85·100//100=100, B=C=15+85·(100//2)//100=57
    # iter2: A=15+85·57//100=63,  B=C=57
    assert r2 == {"A": 63, "B": 57, "C": 57}


def test_pagerank_mass_bounded(spark, docs):
    """On a real graph, total rank mass never exceeds the initial mass
    (dangling loss only shrinks it) and every rank ≥ teleport base."""
    from nyc_taxi_bigdata_pipeline_spark.operators.graph import SCALE, pagerank_fixed_point

    edges = (
        docs.selectExpr("doc_id % 13 AS src", "doc_id % 7 AS dst")
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    ranks = pagerank_fixed_point(edges, iterations=3)
    n = ranks.count()
    agg = ranks.agg(F.sum("r").alias("s"), F.min("r").alias("lo")).first()
    assert agg["s"] <= n * SCALE
    assert agg["lo"] >= 15 * SCALE // 100


def test_pagerank_shuffle_join_path_identical(spark):
    """Above the broadcast threshold the rank joins fall back to shuffle
    equi-joins (the 100-TB path): with broadcasting disabled entirely the
    fixed-point ranks must be bit-identical and the plan must contain no
    BroadcastNestedLoopJoin."""
    from nyc_taxi_bigdata_pipeline_spark.operators.graph import pagerank_fixed_point
    from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan

    edges = spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 1), ("B", "A", 1)], "src string, dst string, w bigint"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ranks = pagerank_fixed_point(
            edges, iterations=2, scale=100, broadcast_nodes_max=0
        )
        got = {r["n"]: r["r"] for r in ranks.collect()}
        plan = physical_plan(ranks)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == {"A": 63, "B": 57, "C": 57}  # == broadcast-path values
    assert "BroadcastNestedLoop" not in plan, plan


def test_pagerank_dangling_reinjection(spark):
    """reinject_dangling=True redistributes the mass parked on
    out-degree-0 nodes uniformly each step. Hand-derived (scale=100,
    d=85, C dangling): iter1 share=85·100//300=28 → A=128 B=C=85;
    iter2 dm=85, share=24 → A=111 B=C=93. Total mass stays ≈ n·scale
    (truncation-only loss) instead of leaking 1/3 per step."""
    from nyc_taxi_bigdata_pipeline_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 1), ("B", "A", 1)], "src string, dst string, w bigint"
    )
    got = {
        r["n"]: r["r"]
        for r in pagerank_fixed_point(
            edges, iterations=2, scale=100, reinject_dangling=True
        ).collect()
    }
    assert got == {"A": 111, "B": 93, "C": 93}
    assert sum(got.values()) >= 3 * 100 - 5  # mass conserved up to truncation


def test_per_key_sample_prefilter_exact(docs):
    """The hash-range pre-filtered plan must pick the IDENTICAL row set
    as the naive full-window formulation — including at oversample=1
    where the guard's fallback path is likely to trigger."""
    naive = {
        (r["lang"], r["doc_id"])
        for r in sampling.per_key_exact_sample(
            docs, "lang", 9, key_col="doc_id", prefilter=False
        ).collect()
    }
    for ov in (16, 1):
        fast = {
            (r["lang"], r["doc_id"])
            for r in sampling.per_key_exact_sample(
                docs, "lang", 9, key_col="doc_id", prefilter=True, oversample=ov
            ).collect()
        }
        assert naive == fast, ov


def test_weighted_deterministic_sample(docs):
    """Longer docs must be kept at higher rates; the kept TOKEN mass
    should be near the target fraction; selection must be stable
    across repartitioning."""
    import pyspark.sql.functions as F2

    weighted = docs.withColumn("w", F2.size(F2.split(F2.trim("text"), " ")))
    kept = sampling.weighted_deterministic_sample(weighted, "w", 0.3, key_col="doc_id")
    tot = weighted.agg(F2.sum("w")).first()[0]
    got = kept.agg(F2.sum("w")).first()[0] or 0
    assert 0.15 < got / tot < 0.45  # expectation 0.3, wide tolerance at 5k docs
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in sampling.weighted_deterministic_sample(
            weighted.repartition(7), "w", 0.3, key_col="doc_id"
        ).collect()
    }
    assert a == b
    # monotone in weight: keep-rate of the longest tercile exceeds shortest
    q1, q2 = weighted.approxQuantile("w", [0.33, 0.67], 0.0)
    terc = weighted.withColumn("kept", F2.col("doc_id").isin(list(a)).cast("int"))
    lo, hi = (
        terc.filter(F2.col("w") <= q1).agg(F2.avg("kept")).first()[0],
        terc.filter(F2.col("w") >= q2).agg(F2.avg("kept")).first()[0],
    )
    assert hi > lo


def test_hll_dataframe_twin_matches_sql(spark, sf_dir):
    """functions/sketch (the DataFrame register builder the streaming
    sink uses) must agree with the oracle-checked SQL formulation
    (hll_distinct_by_type) to the last decimal — same hash, same
    registers, same estimate."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.functions import sketch
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    regs = sketch.hll_registers(ev, ["event_type"], "event_id")
    est = {
        r["event_type"]: r["hll_estimate"]
        for r in sketch.hll_estimate(regs, ["event_type"]).collect()
    }
    sql_rows = REGISTRY["hll_distinct_by_type"].spark_fn(spark, sf_dir).collect()
    assert len(sql_rows) >= 3
    for r in sql_rows:
        assert est[r["event_type"]] == r["hll_estimate"], r["event_type"]


def test_hll_registers_shard_merge_exact(spark, sf_dir):
    """Sketch mergeability: registers built on two disjoint shards and
    MAX-merged must equal registers built on the union — the property
    the streaming sink and any 1000-executor tree aggregation rely on."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.functions import sketch
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        sketch.hll_registers(a, ["event_type"], "event_id")
        .unionByName(sketch.hll_registers(b, ["event_type"], "event_id"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = sketch.hll_registers(ev, ["event_type"], "event_id")
    key = lambda r: (r["event_type"], r["bucket"])
    assert sorted(map(tuple, merged.collect()), key=str) == \
        sorted(map(tuple, whole.collect()), key=str)


def test_phash_image_near_dup(spark, sf_dir):
    """Perceptual-hash dedup: identical images share a phash, a
    grid-mean-preserving block swap stays within Hamming 2, and the
    registry query recovers exactly the planted duplicate pairs."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import phash63

    i, j, c = np.meshgrid(np.arange(32), np.arange(32), np.arange(3), indexing="ij")
    img = ((7 * 2654435761 + i * 40503 + j * 653 + c * 29791) ^ (i * j * 97 + c))
    img = (img.astype(np.int64) % 256).astype(np.uint8)
    assert phash63(img) == phash63(img.copy())
    swapped = img.copy()
    a = swapped[:4, :4, :].copy()
    swapped[:4, :4, :] = swapped[4:8, 4:8, :]
    swapped[4:8, 4:8, :] = a
    assert bin(phash63(img) ^ phash63(swapped)).count("1") <= 2

    row = REGISTRY["image_phash_dedup"].spark_fn(spark, sf_dir).first()
    # one planted pair per 20 ids (exact at ≡1, near at ≡11), and the
    # pigeonhole blocking must not hallucinate extra collisions beyond
    # the occasional random near-hash (pairs stays close to planted)
    n_docs = 500  # sf0.001 documents table
    planted = 2 * (n_docs // 20)
    assert row["pairs"] >= planted
    assert row["pairs"] <= planted + 5
    assert row["exact_pairs"] >= n_docs // 20
    assert row["max_hamming"] <= 3


def test_hamming_near_pairs_generic(spark):
    """The generic pigeonhole blocker finds every pair within Hamming 3
    of a hand-built set and nothing else."""
    from nyc_taxi_bigdata_pipeline_spark.operators.dedup import hamming_near_pairs

    rows = [
        ("a", 0b1010101),
        ("b", 0b1010100),          # d(a,b)=1
        ("c", 0b1010101 ^ (0b111 << 60)),  # d(a,c)=3 in the TOP chunk
        ("d", (1 << 62) | 0b11110000111100001111),  # far from everything
    ]
    df = spark.createDataFrame(rows, "id string, h long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_near_pairs(df, "id", "h", max_hamming=3).collect()
    }
    # d(a,b)=1, d(a,c)=3; d(b,c)=4 is candidate-generated (chunks 1-2
    # match) but must fail the exact verify; "d" pairs with nothing
    assert got == {("a", "b"): 1, ("a", "c"): 3}


def test_hdr_quantile_sketch_accuracy(spark, sf_dir):
    """The log-linear histogram's p50/p90/p99 must land within the bin
    resolution (1/16 ≈ 6.25% relative width) of the exact quantiles."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    got = {r["q"]: r["estimate"]
           for r in REGISTRY["hdr_quantile_sketch"].spark_fn(spark, sf_dir).collect()}
    assert set(got) == {0.5, 0.9, 0.99}
    exact = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .agg(F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("p"))
        .first()["p"]
    )
    for q, true_v in zip((0.5, 0.9, 0.99), exact):
        rel = abs(got[q] - true_v) / true_v
        assert rel < 0.0825, (q, got[q], true_v, rel)


def test_pairwise_cosine_zero_norm_consistent_across_kernels(spark):
    """cos(0-vector, x) must be 0.0 on BOTH the fold path (dim < 256)
    and the Arrow kernel — a NaN from 0/0 would sort FIRST under desc()
    and promote garbage to top-1, and the two paths must never disagree
    across the dim threshold."""
    rows = [
        (1, [0.0, 0.0], 10, [1.0, 2.0]),
        (1, [1.0, 0.0], 11, [1.0, 0.0]),
        (2, [1.0, 2.0], 12, [0.0, 0.0]),
    ]
    pairs = spark.createDataFrame(
        rows, "query_id long, q_vec array<double>, neighbor_id long, c_vec array<double>"
    )
    fold = {(r["query_id"], r["neighbor_id"]): r["cos_sim"]
            for r in similarity._pairwise_cosine(pairs, dim=2).collect()}
    arrow = {(r["query_id"], r["neighbor_id"]): r["cos_sim"]
             for r in similarity._pairwise_cosine(
                 pairs, dim=similarity.ARROW_COSINE_MIN_DIM).collect()}
    assert fold == arrow
    assert fold[(1, 10)] == 0.0 and fold[(2, 12)] == 0.0
    assert abs(fold[(1, 11)] - 1.0) < 1e-12


def test_hdr_bin_rows_matches_sql_twin(spark, sf_dir):
    """The DataFrame HDR binner (streaming twin) must produce identical
    (bin_id, cnt) to the oracle-checked SQL formulation."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.benchqueries.sketch_ops import _hdr_bins_sql
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
    from nyc_taxi_bigdata_pipeline_spark.functions.sketch import hdr_bin_rows
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    df_bins = (
        hdr_bin_rows(o, "o_totalprice")
        .groupBy("bin_id").agg(F.sum("c").cast("bigint").alias("cnt"))
    )
    o.createOrReplaceTempView("hdr_twin_orders")
    sql_bins = spark.sql(_hdr_bins_sql(D.SPARK, "hdr_twin_orders"))
    assert sorted(map(tuple, df_bins.collect())) == \
        sorted(map(tuple, sql_bins.collect()))


def test_bloom_prefilter_join_equivalence(spark, sf_dir):
    """Bloom pre-filtering must never drop a true match (superset
    guarantee), must actually shrink a selective probe, and must plan
    as broadcast semi-joins with no exchange on the big side."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.operators.bloomjoin import bloom_prefilter
    from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)   # selective key set
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    filtered = bloom_prefilter(li, keys, "l_orderkey")
    true_semi = li.join(keys, "l_orderkey", "left_semi")
    # superset of the true semi-join...
    assert filtered.join(keys, "l_orderkey", "left_semi").count() == true_semi.count()
    missed = true_semi.join(filtered.select("l_orderkey").distinct(),
                            "l_orderkey", "left_anti").count()
    assert missed == 0
    # ...and a real reduction on a selective probe
    n_all, n_filt = li.count(), filtered.count()
    assert n_filt < n_all * 0.5
    # the real join over survivors equals the plain join
    a = true_semi.count()
    b = filtered.join(keys, "l_orderkey", "left_semi").count()
    assert a == b
    plan = physical_plan(filtered)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_phash_images_preserves_id_type(spark):
    """phash_images derives media_id's Arrow schema from the input —
    integer ids must survive (the hardcoded-string regression class
    fixed earlier in similarity._pairwise_cosine)."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        encode_ppm,
        phash63,
        phash_images,
    )

    img = (np.arange(32 * 32 * 3, dtype=np.int64) % 256).astype(np.uint8)
    img = img.reshape(32, 32, 3)
    media = spark.createDataFrame(
        [(7, "image", bytearray(encode_ppm(img)))],
        "media_id bigint, kind string, content binary",
    )
    out = phash_images(media)
    assert dict(out.dtypes)["media_id"] == "bigint"
    row = out.first()
    assert row["media_id"] == 7 and row["phash"] == phash63(img)


def test_pagerank_deep_iterations_bounded_planning(spark):
    """iterations > 10 on a small graph must take the eager
    persist-per-step path (bounded lineage — the lazy chain's planning
    cost is superlinear in depth) and stay bit-identical to the
    shuffle-join path at the same depth."""
    from nyc_taxi_bigdata_pipeline_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 1), ("B", "A", 1), ("C", "A", 1)],
        "src string, dst string, w bigint",
    )
    deep = {
        r["n"]: r["r"]
        for r in pagerank_fixed_point(edges, iterations=12).collect()
    }
    via_shuffle = {
        r["n"]: r["r"]
        for r in pagerank_fixed_point(
            edges, iterations=12, broadcast_nodes_max=0
        ).collect()
    }
    assert deep == via_shuffle
    # converged by depth 12: B and C split A's mass equally
    assert deep["B"] == deep["C"]


def test_png_codec_roundtrip_and_parity():
    """Stdlib-zlib PNG codec: encode→decode is exact under every
    scanline filter; decode_image dispatches on magic bytes and a PNG
    of an image phashes/featurizes identically to its PPM twin."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
        encode_ppm,
        image_features,
        media_decoder,
        phash63,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)  # odd dims
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)
    assert phash63(decode_image(encode_png(img))) == phash63(
        decode_image(encode_ppm(img))
    )
    assert np.allclose(media_decoder(encode_png(img)), image_features(img))


def test_png_decode_gray_rgba_palette():
    """Non-truecolor PNGs normalize to (h, w, 3): gray expands, alpha
    drops, palette indexes resolve through PLTE."""
    import struct
    import zlib

    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    def build(w, h, ctype, raster, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        parts = PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            parts += _png_chunk(b"PLTE", plte)
        return parts + _png_chunk(b"IDAT", zlib.compress(raster)) + _png_chunk(b"IEND", b"")

    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    raster = b"".join(b"\x00" + g[y].tobytes() for y in range(4))
    assert np.array_equal(
        decode_png(build(5, 4, 0, raster)), np.repeat(g[:, :, None], 3, axis=2)
    )
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    raster = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    assert np.array_equal(decode_png(build(5, 4, 6, raster)), rgba[:, :, :3])
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idxs = rng.integers(0, 8, (4, 5), dtype=np.uint8)
    raster = b"".join(b"\x00" + idxs[y].tobytes() for y in range(4))
    assert np.array_equal(
        decode_png(build(5, 4, 3, raster, pal.tobytes())), pal[idxs]
    )


def test_minhash_estimate_prefilter_preserves_results(spark, sf_dir):
    """The signature-estimate prefilter (scale path) must return the
    SAME confirmed near-dup pair set as the exact-only chain on the
    planted-dup corpus — estimates gate candidates, never results."""
    from nyc_taxi_bigdata_pipeline_spark.operators.dedup import minhash_dedup
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup(docs).collect()
    }
    filtered = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup(docs, estimate_prefilter=True).collect()
    }
    assert filtered == exact and exact


def test_similarity_string_ids(emb):
    """ANN entry points must derive id dtypes from the input frame
    (r4 ADVICE finding): a string-id corpus used to fail at Arrow
    conversion against the hardcoded `long` mapInPandas schemas."""
    sd = emb.limit(200).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"), "embedding"
    ).cache()
    queries = sd.limit(3)
    dim = len(sd.first()["embedding"])

    bf = similarity.cosine_topk(sd, queries, k=5)
    assert dict(bf.dtypes)["neighbor_id"] == "string"
    rows = bf.collect()
    assert len(rows) == 15 and all(r["neighbor_id"].startswith("doc-") for r in rows)

    ivf = similarity.ivf_topk(sd, queries, k=5, n_cells=4, n_probe=4).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in ivf} == {
        (r["query_id"], r["neighbor_id"]) for r in rows
    }

    lsh = similarity.ann_topk_lsh(sd, queries, dim=dim, k=5, probe_radius=2)
    assert dict(lsh.dtypes)["query_id"] == "string"
    assert lsh.count() > 0

    cb = similarity.pq_train_codebooks(sd, dim=dim, n_subvectors=4, n_codes=8)
    codes = similarity.pq_encode(sd, cb)
    assert dict(codes.dtypes)["vec_id"] == "string"
    rr = similarity.pq_topk_rerank(sd, codes, queries, cb, k=5)
    assert rr.count() == 15


def _smooth_test_image(h=48, w=64):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)], axis=2
    ).astype(np.uint8)
    img[10:20, 10:30] = [200, 30, 40]
    return img


def test_jpeg_codec_roundtrip_and_parity():
    """Stdlib+numpy baseline JPEG: lossy round-trip stays within
    quantization error (PSNR gate), odd dims pad correctly, quality
    dial monotonically trades bytes for error, decode_image sniffs the
    SOI marker, grayscale single-component decodes, and — the r4
    verdict's 'done' bar — the JPEG of an image phashes identically to
    its PNG twin."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        decode_png,
        encode_jpeg,
        encode_png,
        media_decoder,
        phash63,
    )

    img = _smooth_test_image()
    sizes, errs = [], []
    for q in (95, 85, 50):
        payload = encode_jpeg(img, quality=q)
        assert payload.startswith(b"\xff\xd8") and payload.endswith(b"\xff\xd9")
        dec = decode_jpeg(payload)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        mse = np.mean((dec.astype(float) - img) ** 2)
        psnr = 10 * np.log10(255**2 / mse)
        sizes.append(len(payload))
        errs.append(mse)
        assert psnr > (40 if q >= 85 else 30), (q, psnr)
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < errs[1] < errs[2]

    # odd dims exercise the edge-replication pad
    rng = np.random.default_rng(7)
    odd = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, 95)).shape == (17, 23, 3)

    # grayscale: 1-component scan, expands to (h, w, 3)
    g = _smooth_test_image()[:, :, 0]
    dg = decode_jpeg(encode_jpeg(g, 90))
    assert dg.shape == (48, 64, 3)
    assert (dg[:, :, 0] == dg[:, :, 1]).all()
    # step edges ring (normal JPEG behavior) — gate on PSNR, not maxerr
    gp = 10 * np.log10(255**2 / np.mean((dg[:, :, 0].astype(float) - g) ** 2))
    assert gp > 35, gp

    # sniff + cross-format phash parity with the lossless PNG twin
    assert phash63(decode_image(encode_jpeg(img, 85))) == phash63(
        decode_png(encode_png(img))
    )
    feats = media_decoder(encode_jpeg(img, 95))
    assert feats.shape == (16,) and np.isfinite(feats).all()


def _encode_jpeg_420_with_restarts(img, quality=90, restart_interval=2):
    """Test-local writer for what our encoder deliberately doesn't emit:
    a 4:2:0-subsampled, restart-interval stream — exercises the general
    MCU loop (2×2 Y blocks per MCU), nearest-neighbor chroma upsampling,
    and RST handling in decode_jpeg."""
    import struct

    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators import multimodal as M

    h, w, _ = img.shape
    assert h % 16 == 0 and w % 16 == 0, "test helper: multiple-of-16 dims"
    qlum, qchrom = M._quality_tables(quality)
    ycc = M._rgb_to_ycbcr(img)
    y = ycc[:, :, 0]
    # 2×2 mean downsample for chroma
    cb = ycc[:, :, 1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = ycc[:, :, 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    def blocks(plane, qtab):
        return M._component_symbols_and_coefs(plane, qtab)

    # block grids: Y is (h/8 × w/8) row-major; chroma (h/16 × w/16)
    yb, cbb, crb = blocks(y, qlum), blocks(cb, qchrom), blocks(cr, qchrom)
    ybw = w // 8  # Y blocks per row
    cw = w // 16

    # per-MCU emission order: Y(2×2 raster) then Cb, Cr
    mcux, mcuy = w // 16, h // 16

    def mcu_coef_stream():
        for my in range(mcuy):
            for mx in range(mcux):
                ys = []
                for vy in range(2):
                    for hx in range(2):
                        ys.append(yb[(my * 2 + vy) * ybw + mx * 2 + hx])
                yield ys, cbb[my * cw + mx], crb[my * cw + mx]

    # symbol collection (classes: 0=luma, 1=chroma)
    dc_syms, ac_syms = [set(), set()], [set(), set()]

    def sym_pass():
        preds = [0, 0, 0]
        n = 0
        for ys, cbc, crc in mcu_coef_stream():
            if restart_interval and n and n % restart_interval == 0:
                preds = [0, 0, 0]
            n += 1
            for ci, coef_list in ((0, ys), (1, [cbc]), (2, [crc])):
                cls = 0 if ci == 0 else 1
                for coefs in coef_list:
                    diff = int(coefs[0]) - preds[ci]
                    preds[ci] = int(coefs[0])
                    dc_syms[cls].add(M._bit_size(diff))
                    ac = coefs[1:]
                    nz = np.nonzero(ac)[0]
                    prev = -1
                    for i in nz:
                        run = i - prev - 1
                        while run >= 16:
                            ac_syms[cls].add(0xF0)
                            run -= 16
                        ac_syms[cls].add((run << 4) | M._bit_size(int(ac[i])))
                        prev = i
                    if prev != len(ac) - 1:
                        ac_syms[cls].add(0x00)

    sym_pass()
    dc_tabs = [M._fixed_huffman(s) for s in dc_syms]
    ac_tabs = [M._fixed_huffman(s) for s in ac_syms]

    def write_block(bw, coefs, ci, preds):
        cls = 0 if ci == 0 else 1
        diff = int(coefs[0]) - preds[ci]
        preds[ci] = int(coefs[0])
        s = M._bit_size(diff)
        code, ln = dc_tabs[cls][2][s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
        ac = coefs[1:]
        nz = np.nonzero(ac)[0]
        prev = -1
        for i in nz:
            run = i - prev - 1
            while run >= 16:
                c2, l2 = ac_tabs[cls][2][0xF0]
                bw.put(c2, l2)
                run -= 16
            v = int(ac[i])
            sz = M._bit_size(v)
            c2, l2 = ac_tabs[cls][2][(run << 4) | sz]
            bw.put(c2, l2)
            bw.put(v if v > 0 else v + (1 << sz) - 1, sz)
            prev = i
        if prev != len(ac) - 1:
            c2, l2 = ac_tabs[cls][2][0x00]
            bw.put(c2, l2)

    # entropy stream with RST markers between restart intervals
    chunks = []
    bw = M._BitWriter()
    preds = [0, 0, 0]
    n = 0
    rst = 0
    for ys, cbc, crc in mcu_coef_stream():
        if restart_interval and n and n % restart_interval == 0:
            chunks.append(bw.flush())
            chunks.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            bw = M._BitWriter()
            preds = [0, 0, 0]
        n += 1
        for coefs in ys:
            write_block(bw, coefs, 0, preds)
        write_block(bw, cbc, 1, preds)
        write_block(bw, crc, 2, preds)
    chunks.append(bw.flush())

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes(qlum.ravel()[M._ZZ].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qchrom.ravel()[M._ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += seg(0xFFC0, sof)
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for tid in (0, 1):
            bits, vals, _ = tabs[tid]
            out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += b"".join(chunks)
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_subsampled_with_restarts():
    """decode_jpeg's GENERAL paths — 4:2:0 sampling (2×2 Y blocks per
    MCU + chroma upsampling) and restart markers — against a
    test-local conformant writer our encoder deliberately omits."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import decode_jpeg

    img = _smooth_test_image(48, 64)
    payload = _encode_jpeg_420_with_restarts(img, quality=90, restart_interval=2)
    dec = decode_jpeg(payload)
    assert dec.shape == img.shape
    # chroma is quarter-res; luma carries the detail — PSNR stays high
    psnr = 10 * np.log10(255**2 / np.mean((dec.astype(float) - img) ** 2))
    assert psnr > 28, psnr
    # no-restart variant must agree with itself through the RST path
    plain = decode_jpeg(_encode_jpeg_420_with_restarts(img, 90, restart_interval=0))
    assert np.abs(plain.astype(int) - dec.astype(int)).max() <= 1


def test_unigram_logprob_features(spark):
    """Hand-computed add-one unigram LM on a 2-doc corpus: tokens a:2,
    b:1, c:1 → N=4, V=3, denominator ln(7); d1 = (2·ln(3)+ln(2))/3 −
    ln(7), d2 = ln(2) − ln(7). Fixed-point snapping keeps results within
    1e-6 of the closed form."""
    import math

    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.text import (
        unigram_logprob_features,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_logprob_features(docs).collect()}
    d1 = (2 * math.log(3) + math.log(2)) / 3 - math.log(7)
    d2 = math.log(2) - math.log(7)
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 1
    assert abs(got[1]["avg_logprob"] - d1) < 1e-6
    assert abs(got[2]["avg_logprob"] - d2) < 1e-6
    assert not got[1]["low_quality"] and not got[2]["low_quality"]
    # crank the cutoff above both scores: everything flags
    strict = {
        r["doc_id"]: r["low_quality"]
        for r in unigram_logprob_features(
            docs, low_quality_cutoff_fp=0
        ).collect()
    }
    assert strict == {1: True, 2: True}
    # ordering sanity on a corpus with a clear junk doc: the one made of
    # singleton tokens scores strictly lower than the repetitive one
    corpus = spark.createDataFrame(
        [(1, "x x x x x x"), (2, "q w e r t y")], "doc_id long, text string"
    )
    s = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob_features(corpus).collect()}
    assert s[2] < s[1]
    assert np.isfinite(list(s.values())).all()


def test_bfs_distances(spark):
    """Hand-built graph: min-hop distances, unreachable nodes excluded,
    early exit, max_hops bound respected."""
    from nyc_taxi_bigdata_pipeline_spark.operators.graph import bfs_distances

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 3), (7, 8)],
        "src long, dst long",
    )
    und = e.union(e.selectExpr("dst AS src", "src AS dst"))
    src = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(und, src).collect()}
    # 3 is reachable in 2 via 0->5->3 (not 3 via 0->1->2->3); 7/8 unreachable
    assert got == {0: 0, 1: 1, 5: 1, 2: 2, 3: 2, 4: 3}
    # bound: max_hops=1 stops after the first level
    got1 = {r["node"]: r["dist"] for r in bfs_distances(und, src, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 1, 5: 1}
    # multi-source: dist is the min over sources
    multi = spark.createDataFrame([(0,), (4,)], "node long")
    gotm = {r["node"]: r["dist"] for r in bfs_distances(und, multi).collect()}
    assert gotm[3] == 1 and gotm[2] == 2 and gotm[4] == 0
    # r12: past the broadcast threshold the frontier/visited joins fall
    # back to shuffle equi-joins — results must be identical
    got_shuffle = {
        r["node"]: r["dist"]
        for r in bfs_distances(und, src, broadcast_nodes_max=0).collect()
    }
    assert got_shuffle == got


def test_bucketed_write_elides_join_shuffle(spark, tmp_path):
    """Co-located joins (the 100-TB brief's bucketing ask): two tables
    bucketed on the same key with the same bucket count must sort-merge
    join with ZERO exchanges; a mismatched-bucket or unbucketed twin of
    the same join must shuffle. Plan-asserted, not timed."""
    import pyspark.sql.functions as F

    from nyc_taxi_bigdata_pipeline_spark.operators.maintenance import (
        joins_without_shuffle,
        write_bucketed,
    )
    from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan

    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("w")
    )
    for t in ("bkt_left", "bkt_right", "bkt_right8"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed(left, "bkt_left", "k", 4, path=str(tmp_path / "l"))
    write_bucketed(right, "bkt_right", "k", 4, path=str(tmp_path / "r"))
    write_bucketed(right, "bkt_right8", "k", 8, path=str(tmp_path / "r8"))
    try:
        bl, br = spark.table("bkt_left"), spark.table("bkt_right")
        assert joins_without_shuffle(bl, br, "k"), physical_plan(
            bl.hint("merge").join(br, "k")
        )
        # the bucket-sorted layout also pre-pays the merge sort
        plan = physical_plan(bl.hint("merge").join(br, "k"))
        assert "SortMergeJoin" in plan
        # mismatched bucket counts: at least one side must re-shuffle
        assert not joins_without_shuffle(bl, spark.table("bkt_right8"), "k")
        # unbucketed twin: shuffles
        assert not joins_without_shuffle(bl, right, "k")
        # and the data survives the layout: row-parity with a plain join
        got = bl.join(br, "k").count()
        want = left.join(right, "k").count()
        assert got == want == 5_000
    finally:
        for t in ("bkt_left", "bkt_right", "bkt_right8"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_jaccard_verify_arrow_matches_relational(spark, sf_dir):
    """The Arrow verify kernel (sorted-array intersection per pair) must
    produce EXACTLY the relational 3-join form's confirmed set, jaccard
    values included."""
    from nyc_taxi_bigdata_pipeline_spark.operators import dedup
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 50)
    corpus = docs.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    ).unionByName(
        base.withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzextra")))
    )
    sigs = dedup.add_minhash(corpus, num_hashes=16)
    pairs = dedup.lsh_candidate_pairs(sigs, num_hashes=16, bands=4)
    pairs = pairs.localCheckpoint(eager=True)
    rel = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.jaccard_verify(
            pairs, corpus, threshold=0.5, materialize_shingles=True
        ).collect()
    }
    arw = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.jaccard_verify_arrow(pairs, corpus, threshold=0.5).collect()
    }
    assert rel == arw and len(rel) > 100
    # broadcast_arrays_max_bytes=0 forces the join-shape fallback (the
    # over-cap path a corpus-scale candidate set takes) — must be
    # bit-identical to the broadcast-dictionary path used above
    fb = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.jaccard_verify_arrow(
            pairs, corpus, threshold=0.5, broadcast_arrays_max_bytes=0
        ).collect()
    }
    assert fb == arw


def test_containment_verify_broadcast_matches_join_fallback(spark):
    """containment_verify_arrow's broadcast-dictionary path (arrays
    collected once, kernel reads pair ids only) must equal the join
    shape it replaces under the byte cap, containment values included."""
    long_text = " ".join(f"tok{i:03d}" for i in range(80))
    short_text = " ".join(f"tok{i:03d}" for i in range(20))
    mid_text = " ".join(f"tok{i:03d}" for i in range(10, 55))
    df = spark.createDataFrame(
        [(1, short_text), (2, long_text), (3, mid_text)],
        "doc_id long, text string",
    )
    bcast = {
        (r.src_id, r.dst_id, round(r.containment, 9))
        for r in dedup.containment_join_prefix(
            df, threshold=0.4, shingle_n=14
        ).collect()
    }
    pairs_all = spark.createDataFrame(
        [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b],
        "src_id long, dst_id long",
    )
    join_shape = {
        (r.src_id, r.dst_id, round(r.containment, 9))
        for r in dedup.containment_verify_arrow(
            pairs_all, df, threshold=0.4, shingle_n=14,
            broadcast_arrays_max_bytes=0,
        ).collect()
    }
    bcast_all = {
        (r.src_id, r.dst_id, round(r.containment, 9))
        for r in dedup.containment_verify_arrow(
            pairs_all, df, threshold=0.4, shingle_n=14
        ).collect()
    }
    assert bcast_all == join_shape and len(join_shape) >= 2
    # the prefix-filter chain's confirmed set is a subset decided by the
    # same verify — consistent across paths
    assert bcast <= bcast_all


def test_duplicated_spans_matches_sql_twin(spark, sf_dir):
    """The xxhash64 scale path must produce exactly the oracle-backed
    SQL flavor's per-doc span stats (window identity by hash vs by
    string — same equality classes barring 2^-64 collisions)."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.operators.curation import duplicated_spans
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    sql_rows = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"],
                      round(r["dup_frac"], 9))
        for r in REGISTRY["curation_duplicated_spans"].spark_fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    op_rows = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"],
                      round(r["dup_frac"], 9))
        for r in duplicated_spans(docs).collect()
    }
    assert sql_rows == op_rows and len(sql_rows) > 10

    # hand-built miniature: shared 8-token passage in two docs, merged
    # overlapping windows, singleton doc untouched
    passage = "p q r s t u v w"
    mini = spark.createDataFrame(
        [
            (1, f"a b c {passage} x y z"),
            (2, f"m n {passage} o"),
            (3, "totally unique words only here never repeated elsewhere at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicated_spans(mini).collect()}
    assert set(got) == {1, 2}
    assert got[1]["dup_spans"] == 1 and got[1]["dup_tokens"] == 8
    assert got[2]["dup_spans"] == 1 and got[2]["dup_tokens"] == 8


def test_top_passages_hash_path_matches_sql_twin(spark, sf_dir):
    """The hashed top-passages operator must surface the same passage
    multiset as the oracle-backed string-group SQL twin (tiebreak at
    equal occurrence counts may order differently — compare as sets of
    (passage, occurrences, n_docs) after aligning the count cut)."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
    from nyc_taxi_bigdata_pipeline_spark.operators.curation import top_passages
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    sql_rows = [
        (r["passage"], r["occurrences"], r["n_docs"])
        for r in REGISTRY["curation_top_passages"].spark_fn(spark, sf_dir).collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    op_rows = [
        (r["passage"], r["occurrences"], r["n_docs"])
        for r in top_passages(docs).collect()
    ]
    assert len(op_rows) == len(sql_rows) == 20
    # above the lowest shared count, the sets must agree exactly; at the
    # cut count membership can differ by tiebreak — counts must not
    cut = min(r[1] for r in sql_rows)
    assert {r for r in sql_rows if r[1] > cut} == {r for r in op_rows if r[1] > cut}
    assert sorted(r[1] for r in sql_rows) == sorted(r[1] for r in op_rows)


def test_snapshot_diff_statuses_and_null_safety(spark):
    """All four diff classes on a hand-built pair of versions, including
    NULL-involved changes (NULL->value, value->NULL, NULL==NULL)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged
         (2, "b", 20.0),      # NULL -> value = changed
         (4, None, 40.0),     # NULL attr equal both sides = unchanged
         (5, "e", 50.0)],     # added
        "k long, s string, v double",
    )
    got = {r["k"]: r["diff_status"]
           for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "unchanged", 5: "added"}


def test_snapshot_diff_null_vs_sentinel_string(spark):
    """A NULL -> literal-sentinel-string transition must read `changed`:
    in-band sentinels (the r5 ADVICE finding) hash NULL and the string
    ' null' identically; the isNull-flag hash must distinguish them,
    including for values that are empty strings."""
    from nyc_taxi_bigdata_pipeline_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, " null"), (3, None), (4, "")],
        "k long, s string",
    )
    new = spark.createDataFrame(
        [(1, " null"), (2, None), (3, ""), (4, None)],
        "k long, s string",
    )
    got = {r["k"]: r["diff_status"]
           for r in snapshot_diff(old, new, ["k"], ["s"]).collect()}
    assert got == {1: "changed", 2: "changed", 3: "changed", 4: "changed"}


def test_key_skew_profile_zipf_diagnostics(spark):
    """Hot key surfaces at rank 1 with the right share/ratio arithmetic;
    a uniform frame reads skew_ratio == 1.0."""
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import key_skew_profile

    rows = [(7,)] * 60 + [(1,)] * 20 + [(2,)] * 15 + [(3,)] * 5
    df = spark.createDataFrame(rows, "k long")
    prof = key_skew_profile(df, "k", top_n=3).orderBy("rn").collect()
    assert [r["grp_key"] for r in prof] == [7, 1, 2]
    assert prof[0]["share"] == 0.6 and prof[0]["cum_share"] == 0.6
    assert prof[1]["cum_share"] == 0.8
    assert prof[0]["n_keys"] == 4 and prof[0]["total_rows"] == 100
    # max=60, mean=25 -> ratio 2.4
    assert prof[0]["skew_ratio"] == 2.4

    uniform = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    u = key_skew_profile(uniform, "k", top_n=1).collect()[0]
    assert u["skew_ratio"] == 1.0 and u["share"] == 0.2


def test_chunk_tokens_overlap_boundaries(spark):
    """Window/stride arithmetic at the edges: short doc (1 chunk), doc
    of exactly one window, one-past (2 chunks), overlap content, and the
    short final chunk."""
    from nyc_taxi_bigdata_pipeline_spark.operators.packing import chunk_tokens_overlap

    def doc(i, n):
        return (i, " ".join(f"t{k}" for k in range(n)))

    df = spark.createDataFrame(
        [doc(1, 3), doc(2, 8), doc(3, 9), doc(4, 20)], "doc_id long, text string"
    )
    out = chunk_tokens_overlap(df, window=8, stride=6)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # 3 tokens -> one short chunk
    assert rows[(1, 0)]["tok_len"] == 3 and (1, 1) not in rows
    # exactly one window -> one chunk of 8
    assert rows[(2, 0)]["tok_len"] == 8 and (2, 1) not in rows
    # 9 tokens -> second chunk holds the 3-token tail starting at stride
    assert rows[(3, 1)]["tok_start"] == 7 and rows[(3, 1)]["tok_len"] == 3
    # overlap: chunk 1 re-covers window-stride=2 tokens of chunk 0
    c0, c1 = rows[(4, 0)]["chunk_text"].split(), rows[(4, 1)]["chunk_text"].split()
    assert c0[-2:] == c1[:2] == ["t6", "t7"]
    # 20 tokens, W8 S6 -> 1 + ceil(12/6) = 3 chunks; the last window
    # (tokens 13..20, 1-based) reaches the end — no 4th chunk needed
    assert sorted(cid for d, cid in rows if d == 4) == [0, 1, 2]
    assert rows[(4, 2)]["tok_start"] == 13 and rows[(4, 2)]["tok_len"] == 8


def test_hll_overlap_inclusion_exclusion_accuracy(spark, sf_dir):
    """Audience overlap by sketch algebra: the inclusion-exclusion
    estimate must land within HLL error of the exact INTERSECT count
    (error compounds across three estimates — allow 15%), and the
    union estimate must be >= each segment's (set algebra sanity)."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY

    r = REGISTRY["hll_segment_overlap"].spark_fn(spark, sf_dir).collect()[0]
    assert r["exact_overlap"] > 0
    assert abs(r["est_overlap"] / r["exact_overlap"] - 1.0) < 0.15
    assert r["est_union"] >= max(r["est_a"], r["est_b"])
    assert 0.0 < r["est_jaccard"] < 1.0


def _bruteforce_cos_pairs(emb_rows, threshold):
    import numpy as np

    ids = np.array([r[0] for r in emb_rows])
    mat = np.array([r[1] for r in emb_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    nm = mat / norms[:, None]
    sims = nm @ nm.T
    iu = np.triu_indices(len(ids), k=1)
    keep = sims[iu] >= threshold
    return {
        (int(min(a, b)), int(max(a, b))): round(float(s), 6)
        for a, b, s in zip(ids[iu[0][keep]], ids[iu[1][keep]], sims[iu][keep])
    }


def test_semantic_dup_pairs_single_cell_matches_bruteforce(spark, sf_dir):
    """n_cells=1 puts every vector in one cluster, so the SemDeDup pair
    generator must reproduce brute-force all-pairs exactly."""
    from nyc_taxi_bigdata_pipeline_spark.operators.similarity import semantic_dup_pairs
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    expected = _bruteforce_cos_pairs(
        emb.select("vec_id", "embedding").collect(), 0.35
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in semantic_dup_pairs(emb, threshold=0.35, n_cells=1).collect()
    }
    assert got.keys() == expected.keys()
    assert all(abs(got[k] - expected[k]) < 1e-9 for k in got)


def test_semantic_dedup_cell_blocking_and_labels(spark, sf_dir):
    """Cell blocking may only LOSE pairs (never invent them), recall on
    the fixture must be non-trivial (similar vectors co-cluster — the
    SemDeDup premise), and the collapsed labels must be canonical:
    every canonical_id <= its vec_id and itself kept (is_dup = false)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.similarity import (
        semantic_dedup,
        semantic_dup_pairs,
    )
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    expected = _bruteforce_cos_pairs(
        emb.select("vec_id", "embedding").collect(), 0.35
    )
    blocked = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(emb, threshold=0.35, n_cells=8).collect()
    }
    assert blocked <= expected.keys()
    assert len(blocked) / len(expected) > 0.2

    labeled = semantic_dedup(emb, threshold=0.35, n_cells=8).collect()
    assert len(labeled) == emb.count()
    kept = {r["vec_id"] for r in labeled if not r["is_dup"]}
    for r in labeled:
        assert r["canonical_id"] <= r["vec_id"]
        assert r["canonical_id"] in kept
        assert r["is_dup"] == (r["canonical_id"] != r["vec_id"])


def test_semantic_dedup_matches_pairs_plus_global_collapse(spark, sf_dir):
    """The in-task per-cell union-find must produce EXACTLY the labels
    of the former shape (materialize pairs -> global dedup_clusters
    label propagation): cells partition the corpus, so all SemDeDup
    edges are within-cell and the global component structure is the
    per-cell one. Same seed -> same KMeans cells on both paths."""
    from nyc_taxi_bigdata_pipeline_spark.operators.dedup import dedup_clusters
    from nyc_taxi_bigdata_pipeline_spark.operators.similarity import (
        semantic_dedup,
        semantic_dup_pairs,
    )
    from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    for cells in (1, 8):
        pairs = semantic_dup_pairs(emb, threshold=0.35, n_cells=cells)
        old_clusters = {
            r["vec_id"]: r["cluster"]
            for r in dedup_clusters(pairs, id_col="vec_id").collect()
        }
        expected = {
            r["vec_id"]: old_clusters.get(r["vec_id"], r["vec_id"])
            for r in emb.select("vec_id").collect()
        }
        got = {
            r["vec_id"]: r["canonical_id"]
            for r in semantic_dedup(emb, threshold=0.35, n_cells=cells).collect()
        }
        assert got == expected


def test_resize_bilinear_kernel_math():
    """Pinned bilinear geometry: constants stay constant, a 2x block
    downsample equals exact block means (half-pixel centers sample at
    fy = fx = 0.5), and output dims/dtype are as requested."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import resize_bilinear

    const = np.full((6, 4, 3), 77, dtype=np.uint8)
    out = resize_bilinear(const, 2, 3)
    assert out.shape == (3, 2, 3) and out.dtype == np.uint8
    assert (out == 77).all()

    # 4x4 -> 2x2: each target center lands exactly between 4 source
    # pixels, so every output value is that 2x2 block's mean
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[..., 0] = np.array(
        [[0, 4, 8, 12], [16, 20, 24, 28], [32, 36, 40, 44], [48, 52, 56, 60]]
    )
    out = resize_bilinear(img, 2, 2)
    expected = np.array([[10, 18], [42, 50]])
    assert (out[..., 0] == expected).all() and (out[..., 1:] == 0).all()


def test_resize_images_end_to_end(spark):
    """Decode->resize->re-encode across all three REAL codecs: the PPM
    outputs decode back at the target resolution with the same pixels
    the kernel produces locally."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        decode_ppm,
        encode_jpeg,
        encode_png,
        encode_ppm,
        resize_bilinear,
        resize_images,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
    payloads = [
        ("ppm", encode_ppm(img)),
        ("png", encode_png(img)),
        ("jpg", encode_jpeg(img)),
    ]
    media = spark.createDataFrame(
        [(f"m_{fmt}", "image", bytearray(p)) for fmt, p in payloads],
        "media_id string, kind string, content binary",
    )
    rows = {r["media_id"]: r for r in resize_images(media, 6, 8).collect()}
    assert set(rows) == {"m_ppm", "m_png", "m_jpg"}
    for fmt, payload in payloads:
        r = rows[f"m_{fmt}"]
        assert (r["width"], r["height"], r["format"]) == (6, 8, "ppm")
        got = decode_ppm(bytes(r["content"]))
        assert got.shape == (8, 6, 3)
    # lossless paths must match the local kernel byte-for-byte
    local = resize_bilinear(img, 6, 8)
    for fmt in ("ppm", "png"):
        assert (decode_ppm(bytes(rows[f"m_{fmt}"]["content"])) == local).all()


# ---------------------------------------------------------------- misra-gries


@pytest.fixture(scope="module")
def zipf_tokens(spark):
    """Skewed token stream: known exact counts, far more distinct tokens
    than the MG capacity used in tests, so decrements actually fire."""
    rows = []
    heavy = [("alpha", 5000), ("beta", 2200), ("gamma", 900)]
    for tok, cnt in heavy:
        rows += [(tok,)] * cnt
    for i in range(300):  # long tail: 300 tokens × 10
        rows += [(f"tail{i:03d}",)] * 10
    return spark.createDataFrame(rows, "token string"), dict(
        heavy, **{f"tail{i:03d}": 10 for i in range(300)}
    )


def _exact_hh(counts: dict, capacity: int):
    n = sum(counts.values())
    return {t: c for t, c in counts.items() if c * (capacity + 1) > n}


def test_mg_heavy_hitters_exact_under_any_partitioning(spark, zipf_tokens):
    """MG candidates + exact recount must equal the exact GROUP BY/HAVING
    set — including counts — regardless of partition layout (the
    candidate superset is partition-dependent; the answer is not)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import mg_heavy_hitters

    df, counts = zipf_tokens
    expected = _exact_hh(counts, 8)
    assert expected, "fixture must produce heavy hitters"
    for parts in (1, 7):
        got = {
            r["token"]: r["cnt"]
            for r in mg_heavy_hitters(df.repartition(parts), "token", 8).collect()
        }
        assert got == expected


def test_mg_heavy_hitters_exact_mode_capacity_ge_vocab(spark, zipf_tokens):
    """capacity ≥ distinct tokens → no decrements, candidates = vocab,
    output = every token above the share threshold."""
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import mg_heavy_hitters

    df, counts = zipf_tokens
    cap = len(counts) + 10
    got = {r["token"]: r["cnt"] for r in mg_heavy_hitters(df, "token", cap).collect()}
    assert got == _exact_hh(counts, cap)


def test_mg_partition_summaries_bounds(spark, zipf_tokens):
    """Per-partition state bound (≤ capacity rows each), weights never
    exceed true counts, and on a single partition the MG undercount
    bound weight ≥ count − n/(cap+1) holds for surviving tokens."""
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import (
        mg_partition_summaries,
    )

    df, counts = zipf_tokens
    n = sum(counts.values())
    cap = 8
    multi = mg_partition_summaries(df.repartition(5), "token", cap).collect()
    assert len(multi) <= cap * 5
    for r in multi:
        assert r["mg_weight"] <= counts[r["token"]]
    single = mg_partition_summaries(df.coalesce(1), "token", cap).collect()
    assert len(single) <= cap
    for r in single:
        assert r["mg_weight"] >= counts[r["token"]] - n / (cap + 1)
    # every true heavy hitter survives the single-partition summary
    surv = {r["token"] for r in single}
    assert set(_exact_hh(counts, cap)) <= surv


def test_mg_null_tokens_dropped(spark):
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import mg_heavy_hitters

    df = spark.createDataFrame(
        [("a",)] * 9 + [(None,)] * 50 + [("b",)], "token string"
    )
    got = {r["token"]: r["cnt"] for r in mg_heavy_hitters(df, "token", 3).collect()}
    assert got == {"a": 9}  # n=10 non-null; 9*4 > 10, 1*4 < 10


# ------------------------------------------------------- prefix-filter ssjoin


def test_jaccard_join_prefix_matches_bruteforce(spark, docs_with_dups):
    """The exact SSJoin must reproduce brute-force all-pairs verification
    bit-for-bit (prefix + length filters are lossless by theorem)."""
    from nyc_taxi_bigdata_pipeline_spark.operators import dedup

    ids = docs_with_dups.select("doc_id")
    allpairs = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    for thr in (0.5, 0.9):
        expected = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in dedup.jaccard_verify(
                allpairs, docs_with_dups, threshold=thr
            ).collect()
        }
        got = {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in dedup.jaccard_join_prefix(
                docs_with_dups, threshold=thr
            ).collect()
        }
        assert got == expected
        assert expected, f"fixture must contain near-dup pairs at {thr}"


# ------------------------------------------------------------------ BPE


def _ref_learn_bpe(word_freqs, n_merges, min_pair_freq=2):
    """Pure-Python Sennrich-style reference trainer (greedy global
    most-frequent pair, count-desc then lexicographic tiebreak)."""
    vocab = {}
    for w, f in word_freqs.items():
        syms = tuple(list(w[:-1]) + [w[-1] + "▁"])
        vocab[syms] = vocab.get(syms, 0) + f
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def bpe_corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a rat sat on a hat",
        "the hat on the mat",
        "low lower lowest slow slower",
        "low low low lower lowest",
    ] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    freqs = {}
    for t in texts:
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    return df, freqs


def test_learn_bpe_matches_reference(spark, bpe_corpus):
    from nyc_taxi_bigdata_pipeline_spark.operators import bpe

    df, freqs = bpe_corpus
    for n in (5, 25):
        got = bpe.learn_bpe(df, n)
        assert got == _ref_learn_bpe(freqs, n)
    assert len(bpe.learn_bpe(df, 5)) == 5  # corpus supports ≥5 merges


def test_learn_bpe_distributed_path_matches_driver_path(spark, bpe_corpus):
    """small_vocab_cap=None forces the distributed merge loop; it must
    produce the identical merge list to the driver-side small-vocab
    path (r12: the registry queries ride the driver path on bounded
    vocabularies, so this equality is what keeps their results
    unchanged)."""
    from nyc_taxi_bigdata_pipeline_spark.operators import bpe

    df, freqs = bpe_corpus
    for n in (5, 25):
        dist = bpe.learn_bpe(df, n, small_vocab_cap=None)
        assert dist == _ref_learn_bpe(freqs, n)
        assert dist == bpe.learn_bpe(df, n)


def test_learn_bpe_partition_invariant(spark, bpe_corpus):
    from nyc_taxi_bigdata_pipeline_spark.operators import bpe

    df, freqs = bpe_corpus
    # distributed loop forced: partition invariance is a property of
    # the distributed path (the driver path collects one table)
    assert bpe.learn_bpe(
        df.repartition(7), 8, small_vocab_cap=None
    ) == _ref_learn_bpe(freqs, 8)


def test_bpe_encode_lossless_and_in_vocab(spark, bpe_corpus):
    from nyc_taxi_bigdata_pipeline_spark.operators import bpe

    df, freqs = bpe_corpus
    merges = bpe.learn_bpe(df, 20)
    vocab = {a + b for a, b, _ in merges}
    enc = {r["doc_id"]: r["tokens"] for r in bpe.bpe_encode(df, merges).collect()}
    for r in df.collect():
        toks = enc[r["doc_id"]]
        rebuilt = "".join(toks).replace("▁", " ").strip()
        assert rebuilt == " ".join(r["text"].lower().split())
        for t in toks:
            base = t
            assert base in vocab or len(base.replace("▁", "")) == 1


# ------------------------------------------------------- incremental dedup


def test_dedup_incremental_against_corpus(spark, docs):
    """Daily-ingest wiring: batch docs near-duplicating the corpus are
    dropped, within-batch clusters collapse to canonicals, everything
    else survives. Expected sets derived by brute force (exact jaccard
    over all cross/batch pairs + union-find), so the test pins the
    pipeline wiring, not the (separately tested) jaccard math."""
    from nyc_taxi_bigdata_pipeline_spark.operators import dedup

    corpus = docs.select("doc_id", "text").limit(30).cache()
    fresh = (
        docs.select("doc_id", "text")
        .orderBy("doc_id")
        .limit(45)
        .orderBy(F.desc("doc_id"))
        .limit(10)
    )
    batch = (
        corpus.limit(4)  # exact copies → contaminated
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .unionByName(  # near-copies (tail edit) → contaminated
            corpus.limit(7)
            .exceptAll(corpus.limit(4))
            .withColumn("doc_id", F.col("doc_id") + 2_000_000)
            .withColumn("text", F.concat("text", F.lit(" zq")))
        )
        .unionByName(fresh.withColumn("doc_id", F.col("doc_id") + 3_000_000))
        .unionByName(  # within-batch dup family of one fresh doc
            fresh.limit(1)
            .crossJoin(spark.range(2).withColumnRenamed("id", "r"))
            .select(
                (F.col("doc_id") + 4_000_000 + F.col("r")).alias("doc_id"),
                "text",
            )
        )
        .cache()
    )
    thr = 0.8
    both = corpus.unionByName(batch)
    cross = (
        batch.select(F.col("doc_id").alias("id_a"))
        .crossJoin(corpus.select(F.col("doc_id").alias("id_b")))
    )
    contaminated = {
        r["id_a"]
        for r in dedup.jaccard_verify(cross, both, threshold=thr).collect()
    }
    surv_ids = sorted(
        r["doc_id"] for r in batch.collect() if r["doc_id"] not in contaminated
    )
    surv = batch.filter(~F.col("doc_id").isin(list(contaminated)))
    inpairs = (
        surv.select(F.col("doc_id").alias("id_a"))
        .crossJoin(surv.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    parent = {i: i for i in surv_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in dedup.jaccard_verify(inpairs, batch, threshold=thr).collect():
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    expected = {i for i in surv_ids if find(i) == i}

    index = dedup.minhash_band_index(corpus)
    out = dedup.dedup_incremental(batch, corpus, index, threshold=thr)
    got = {r["doc_id"] for r in out.collect()}
    assert got == expected
    assert contaminated, "fixture must contaminate some batch docs"
    assert len(expected) < len(surv_ids), "within-batch collapse must fire"


def test_mg_heavy_hitters_non_string_tokens(spark):
    """The MG path is type-generic (internal hashing + recount on the
    original column — the hardcoded-dtype regression class)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import mg_heavy_hitters

    rows = [(7,)] * 60 + [(42,)] * 30 + [(i,) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "token bigint")
    got = {r["token"]: r["cnt"] for r in mg_heavy_hitters(df, "token", 5).collect()}
    n = len(rows)
    assert got == {7: 60, 42: 30} and all(c * 6 > n for c in got.values())


def test_mg_heavy_hitters_weighted_exact_under_any_partitioning(spark):
    """Weighted MG (mass = integral weights): exact GROUP BY/HAVING-on-
    SUM equality under any partition layout, decrements active
    (capacity << distinct keys)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.skew import (
        mg_heavy_hitters_weighted,
    )

    rows = [("whale", 900_000), ("orca", 310_000)]
    rows += [(f"fish{i:03d}", 1_000 + i) for i in range(300)]
    rows += [("nullw", 0), (None, 50_000)]  # dropped: non-positive / null
    df = spark.createDataFrame(rows, "k string, w long")
    total = 900_000 + 310_000 + sum(1_000 + i for i in range(300))
    cap = 8
    expected = {
        k: w
        for k, w in rows
        if k is not None and w > 0 and w * (cap + 1) > total
    }
    assert expected == {"whale": 900_000, "orca": 310_000}
    for parts in (1, 7):
        got = {
            r["k"]: r["wsum"]
            for r in mg_heavy_hitters_weighted(
                df.repartition(parts), "k", "w", cap
            ).collect()
        }
        assert got == expected


# ------------------------------------------------- edit-distance join


def _lev_bruteforce(spark, rows, k):
    df = spark.createDataFrame(rows, "id long, s string")
    a, b = df.alias("a"), df.alias("b")
    return {
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= k)
        .collect()
    }


def test_levenshtein_self_join_matches_bruteforce(spark):
    """PassJoin segment blocking must be lossless: exact set equality
    with brute-force all-pairs for k=1 and k=2 on a corpus mixing
    natural words, near-dups, short strings (L <= k) and empties."""
    from nyc_taxi_bigdata_pipeline_spark.operators.editdist import (
        levenshtein_self_join,
    )

    words = [
        "spark", "sparks", "spork", "shark", "sharp", "spar", "scar",
        "analytics", "analytic", "analytcs", "anaiytics",
        "pipeline", "pipelines", "pipelin", "pupeline",
        "a", "b", "ab", "ba", "", "x", "xy", "abc", "abd", "acb",
        "levenshtein", "levenstein", "levenshtien",
        "deduplicate", "deduplicates", "reduplicate",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2):
        expected = _lev_bruteforce(spark, rows, k)
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in levenshtein_self_join(df, "id", "s", k=k).collect()
        }
        assert got == expected
        assert expected, f"fixture must contain pairs within k={k}"


def test_levenshtein_candidates_verified_param_exact(spark):
    """``verified=True`` (DP pushed below the pair distinct) must yield
    the same candidate SET as the default post-distinct shape, minus
    only the >k rows the verify removes — i.e. filtering the default's
    output equals the verified output (distinct commutes with the
    deterministic per-row filter)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.editdist import (
        levenshtein_candidates,
    )

    rows = [(i, f"token{i % 40:02d}x{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s string")
    import pyspark.sql.functions as F2
    default_filtered = {
        (r.pid_a, r.pid_b)
        for r in levenshtein_candidates(df, "id", "s", k=1)
        .filter(F2.levenshtein("ps_a", "ps_b") <= 1)
        .collect()
    }
    verified = {
        (r.pid_a, r.pid_b)
        for r in levenshtein_candidates(df, "id", "s", k=1, verified=True)
        .collect()
    }
    assert verified == default_filtered and verified


def test_levenshtein_self_join_partition_invariant(spark):
    from nyc_taxi_bigdata_pipeline_spark.operators.editdist import (
        levenshtein_self_join,
    )

    rows = [(i, f"token{i % 40:02d}x{i % 7}") for i in range(200)]
    expected = _lev_bruteforce(spark, rows, 1)
    df = spark.createDataFrame(rows, "id long, s string").repartition(13)
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in levenshtein_self_join(df, "id", "s", k=1).collect()
    }
    assert got == expected
    assert expected


# ------------------------------------------------- BM25 / bigram LM


def test_bm25_topk_matches_python_reference(spark):
    """Exact fixed-point agreement with a pure-Python BM25 (k1=1.2,
    b=0.75, Lucene positive IDF), including the rational-integer
    clearing of avgdl and the (score desc, id asc) tiebreak."""
    import math

    from nyc_taxi_bigdata_pipeline_spark.operators.search import bm25_topk

    docs = [
        (1, "hash join hash table build probe"),
        (2, "sort merge join spill"),
        (3, "scan filter pushdown column prune scan scan"),
        (4, "hash aggregate partial merge"),
        (5, "broadcast hash join small build side"),
        (6, "window rank partition order"),
    ]
    queries = [(1, "hash join"), (2, "scan filter"), (3, "merge")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # ---- python reference
    toks = {d: t.split() for d, t in docs}
    tf = {d: {} for d, _ in docs}
    for d, ts in toks.items():
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(ts) for d, ts in toks.items()}
    nd = len(docs)
    tt = sum(dl.values())
    dfreq = {}
    for d in tf:
        for t in tf[d]:
            dfreq[t] = dfreq.get(t, 0) + 1

    def fp_term(t, d):
        f = tf[d].get(t, 0)
        if f == 0 or t not in dfreq:
            return None
        idf = math.log(1.0 + (2 * (nd - dfreq[t]) + 1) / (2 * dfreq[t] + 1))
        part = (22 * f * tt) / (10 * f * tt + 3 * tt + 9 * dl[d] * nd)
        return math.floor(idf * part * 1_000_000.0 + 0.5)

    expected = {}
    for qid, qtext in queries:
        scores = {}
        for d, _ in docs:
            s = [fp_term(t, d) for t in set(qtext.split())]
            s = [x for x in s if x is not None]
            if s:
                scores[d] = sum(s)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, fp) in enumerate(ranked[:3], 1):
            expected[(qid, d)] = (fp / 1_000_000.0, rank)

    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(spark, df, queries, k=3).collect()
    }
    assert got == expected
    assert expected


def test_bigram_logprob_matches_python_reference(spark):
    """Exact fixed-point agreement with a pure-Python add-one bigram LM;
    single-token docs are absent (no bigrams) by contract."""
    import math

    from nyc_taxi_bigdata_pipeline_spark.operators.text import (
        bigram_logprob_features,
    )

    docs = [
        (1, "the quick fox jumps the quick dog"),
        (2, "the quick fox"),
        (3, "dog jumps dog jumps dog"),
        (4, "solo"),
        (5, None),
        (6, "quick the quick the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    toks = {d: t.lower().split() for d, t in docs if t is not None}
    uni, c2 = {}, {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(uni)

    expected = {}
    for d, ts in toks.items():
        fps = [
            math.floor(
                math.log((c2[(a, b)] + 1) / (uni[a] + v)) * 1_000_000.0 + 0.5
            )
            for a, b in zip(ts, ts[1:])
        ]
        if not fps:
            continue
        s, n = sum(fps), len(fps)
        expected[d] = (n, s / (n * 1_000_000.0), s < -9_000_000 * n)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["low_quality"])
        for r in bigram_logprob_features(df, "doc_id", "text").collect()
    }
    assert got == expected
    assert 4 not in got and 5 not in got


# ------------------------------------------------- audio spectrograms


def test_stft_power_matches_direct_dft():
    """The rfft backend is pinned against a direct O(n^2) DFT on a
    deterministic multi-tone signal — an fft library change that alters
    values gets caught here, not downstream."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import stft_power

    n_fft, hop = 64, 32
    t = np.arange(400, dtype=np.float64)
    x = np.sin(2 * np.pi * 0.11 * t) + 0.5 * np.cos(2 * np.pi * 0.31 * t + 1.0)
    got = stft_power(x, n_fft=n_fft, hop=hop)
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(x) - n_fft) // hop
    assert got.shape == (n_frames, n_fft // 2 + 1)
    k = np.arange(n_fft // 2 + 1)[:, None]
    m = np.arange(n_fft)[None, :]
    dft = np.exp(-2j * np.pi * k * m / n_fft)  # (bins, n_fft)
    for f in range(n_frames):
        frame = x[f * hop: f * hop + n_fft] * window
        ref = np.abs(dft @ frame) ** 2
        assert np.allclose(got[f], ref, rtol=1e-9, atol=1e-9)


def test_spectrogram_features_pure_tone_and_silence():
    """A pure tone's centroid lands on its frequency (±1 bin), its
    energy lands in the right band, flatness is near 0; silence and
    too-short clips return zero stats; band fractions sum to 1."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        spectrogram_features,
    )

    rate, n_fft = 16000, 256
    # 3.5 kHz = bin 56, the CENTER of band 3 (bins 48..64 of 129) — a
    # band-edge tone (e.g. 3 kHz = bin 48) legitimately leaks across
    # the boundary via Hann sidelobes
    f_tone = 3500.0
    t = np.arange(8000, dtype=np.float64) / rate
    tone = np.sin(2 * np.pi * f_tone * t)
    feats = spectrogram_features(tone, rate, n_fft=n_fft, n_bands=8)
    n_frames, centroid, bandwidth, flatness = feats[:4]
    bands = feats[4:]
    assert n_frames == 1 + (8000 - 256) // 128
    assert abs(centroid - f_tone) < rate / n_fft  # within one bin
    assert flatness < 0.01
    assert abs(bands.sum() - 1.0) < 1e-12
    # 3.5 kHz of an 8 kHz Nyquist with 8 bands (1 kHz each) -> band 3
    assert np.argmax(bands) == 3 and bands[3] > 0.95

    silent = spectrogram_features(np.zeros(4000), rate)
    assert silent[0] == 1 + (4000 - 256) // 128  # frames still counted
    assert (silent[1:] == 0).all()  # spectral stats zeroed
    assert (spectrogram_features(np.zeros(10), rate) == 0).all()  # < 1 frame


def test_audio_spectrograms_dataframe_roundtrip(spark):
    """WAV encode -> Spark decode/spectrogram matches the local kernel
    exactly, and the blobless output schema carries the dominant band."""
    import numpy as np

    from nyc_taxi_bigdata_pipeline_spark.operators.multimodal import (
        audio_spectrograms,
        encode_wav,
        spectrogram_features,
    )

    rate = 16000
    clips = {}
    rows = []
    for i, f_tone in enumerate([500.0, 2500.0, 6500.0]):
        t = np.arange(6000, dtype=np.float64) / rate
        x = np.round(np.sin(2 * np.pi * f_tone * t) * 30000).astype(np.int16)
        clips[str(i)] = x
        rows.append((str(i), "audio", bytearray(encode_wav(x, rate))))
    media = spark.createDataFrame(
        rows, "media_id string, kind string, content binary"
    ).repartition(3)
    got = {r["media_id"]: r for r in audio_spectrograms(media).collect()}
    assert set(got) == set(clips)
    for mid, x in clips.items():
        ref = spectrogram_features(x.astype(np.float64) / 32768.0, rate)
        r = got[mid]
        assert r["n_frames"] == int(ref[0])
        assert abs(r["centroid_hz"] - ref[1]) < 1e-9
        assert abs(r["bandwidth_hz"] - ref[2]) < 1e-9
        assert r["dominant_band"] == int(np.argmax(ref[4:]))
    # expected dominant bands for 500/2500/6500 Hz at 1 kHz bands
    assert [got[k]["dominant_band"] for k in ["0", "1", "2"]] == [0, 2, 6]


def test_levenshtein_two_piece_matches_bruteforce(spark):
    """The m=k+2 / >=2-surviving-pieces blocking must equal brute force
    on the same mixed fixture as the k+1 scheme (shorts and empties
    route through the shared deletion-neighborhood path)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.editdist import (
        levenshtein_self_join,
    )

    words = [
        "spark", "sparks", "spork", "shark", "sharp", "spar", "scar",
        "analytics", "analytic", "analytcs", "anaiytics",
        "pipeline", "pipelines", "pipelin", "pupeline",
        "a", "b", "ab", "ba", "", "x", "xy", "abc", "abd", "acb",
        "levenshtein", "levenstein", "levenshtien",
        "deduplicate", "deduplicates", "reduplicate",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2):
        expected = _lev_bruteforce(spark, rows, k)
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in levenshtein_self_join(
                df, "id", "s", k=k, pieces="k+2"
            ).collect()
        }
        assert got == expected
        assert expected


def test_grouped_quantile_null_group_keys_dropped(spark):
    """NULL group keys must be dropped, not crash the driver-side
    interpolation (r9 ADVICE: the refinement equi-join silently drops
    null-keyed rows, so their target ranks could never resolve)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.quantiles import (
        grouped_quantile_select,
    )

    rows = [("a", float(i)) for i in range(1, 101)]
    rows += [("b", float(i * 2)) for i in range(1, 51)]
    rows += [(None, float(i)) for i in range(1, 21)]  # null-keyed group
    df = spark.createDataFrame(rows, "g string, v double")
    out = grouped_quantile_select(df, ["g"], "v", [0.5, 0.9]).collect()
    got = {(r["g"], r["p"]): (r["n"], r["qvalue"]) for r in out}
    assert set(got) == {("a", 0.5), ("a", 0.9), ("b", 0.5), ("b", 0.9)}
    # exact interpolated medians of 1..100 and 2..100-by-2
    assert got[("a", 0.5)] == (100, 50.5)
    assert got[("b", 0.5)] == (50, 51.0)
    # same IEEE op sequence as the operator/oracle: r = 1 + 99*0.9
    r = 1.0 + 99 * 0.9
    assert got[("a", 0.9)] == (100, 90.0 + (91.0 - 90.0) * (r - 90))


def test_grouped_quantile_max_groups_guard(spark):
    """Group cardinality above max_groups must raise (r9 verdict item 5)
    instead of silently building driver-side cell state per group."""
    import pytest

    from nyc_taxi_bigdata_pipeline_spark.operators.quantiles import (
        grouped_quantile_select,
    )

    df = spark.range(200).selectExpr("id AS g", "CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="max_groups"):
        grouped_quantile_select(df, ["g"], "v", [0.5], max_groups=100)
    # at-or-under the bound still works
    out = grouped_quantile_select(df, ["g"], "v", [0.5], max_groups=200)
    assert out.count() == 200


def test_registry_ann_queries_recall_floor(spark, sf_dir):
    """r9 verdict item 3: the rows-only REGISTRY queries ann_lsh_topk /
    ann_ivfpq_topk had no recall gate — a bucket-probe or codebook
    regression would pass their rows-only driver check silently. Recall
    is measured against the oracle-backed exact query on the same
    corpus/queries/k. Measured at sf0.01: LSH 0.76, IVF-PQ 0.98; floors
    leave margin for hash/kmeans plan jitter but catch a broken probe."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["similarity_knn_bruteforce"].spark_fn(spark, sf_dir).collect()
    }
    assert exact
    for name, floor in [("ann_lsh_topk", 0.6), ("ann_ivfpq_topk", 0.85)]:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in REGISTRY[name].spark_fn(spark, sf_dir).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= floor, f"{name} recall {recall:.2f} < {floor}"
