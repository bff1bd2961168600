"""Scale-path similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random hyperplane) approximate variant as the scale path. The query
set is broadcast (it's small); candidates stream through a vectorized
Pandas UDF doing one numpy matmul per Arrow batch — the idiomatic way
to get BLAS throughput out of Spark for this shape. Per-query top-k is
a window rank (Spark plans per-partition partial top-k before the final
shuffle, so the full score matrix never materializes).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    rows = queries.select(id_col, vec_col).collect()
    # keep the ids' natural dtype (object array for string ids) — forcing
    # int64 would crash or miscast non-bigint id columns
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def _id_dtype(df: DataFrame, col: str) -> str:
    """The Spark dtype string of an id column, for mapInPandas return
    schemas: hardcoding `long` fails at Arrow conversion (or silently
    miscasts) for corpora with string/non-bigint ids."""
    return dict(df.dtypes)[col]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k of each query against the corpus.

    Executes as: broadcast query matrix (driver→executors inside the
    mapInPandas closure), one matmul per Arrow batch, per-batch local
    top-k, then a global window rank over the (tiny) surviving rows.
    """
    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ q_mat.T  # (batch, n_queries)
            # k+1 so dropping the query's own row later can't starve a query
            n_local = min(k + 1, sims.shape[0])
            # per-batch partial top-k keeps the shuffle tiny
            idx = np.argpartition(-sims, n_local - 1, axis=0)[:n_local]
            out = {
                "query_id": np.repeat(q_ids, n_local),
                "neighbor_id": pdf[id_col].to_numpy()[idx].T.ravel(),
                "cos_sim": np.take_along_axis(sims, idx, axis=0).T.ravel(),
            }
            yield pd.DataFrame(out)

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score,
        f"query_id {_id_dtype(queries, id_col)},"
        f" neighbor_id {_id_dtype(corpus, id_col)}, cos_sim double",
    )
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_fraction: float | None = None,
    materialize: bool = False,
):
    """Build the IVF index ONCE: train the KMeans coarse quantizer
    (optionally on a ``train_fraction`` sample — centroid quality needs
    a bounded sample, not the full corpus) and assign every corpus
    vector to its cell. Returns ``(assigned, centers)`` for any number
    of :func:`ivf_topk` calls.

    This split is where IVF earns its keep: the quantizer fit +
    assignment is the EXPENSIVE part (measured 15× a single brute-force
    query batch at 200k vectors when re-done per call), amortized to
    zero when the index is reused across query batches — which is the
    only deployment shape that makes sense. ``materialize`` eagerly
    localCheckpoints the assignment so repeated searches don't re-run
    the transform."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = F.col(vec_col).cast("array<double>")
    corpus_v = corpus.withColumn("__v", array_to_vector(vec))
    train = (
        corpus_v.sample(fraction=train_fraction, seed=seed)
        if train_fraction is not None
        else corpus_v
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="__cell").fit(
        train
    )
    assigned = model.transform(corpus_v).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("__cell").alias("cell"),
    )
    if materialize:
        assigned = assigned.localCheckpoint(eager=True)
    return assigned, np.array(model.clusterCenters())


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index=None,
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    corpus vector to a cell; each query scans only its ``n_probe``
    nearest cells. The scan within probed cells is the exact numpy
    kernel of :func:`cosine_topk`.

    Pass ``index`` from :func:`ivf_build` to reuse a prebuilt quantizer
    across query batches (the deployment shape); without it the index
    is built inline for this one call — convenient for tests, but the
    build dominates a single batch's cost.

    Scale shape: cell assignment is one map-only transform, and the
    search reads ~n_probe/n_cells of the corpus ONCE — the probed rows
    stream through the same matmul kernel as :func:`cosine_topk`, with
    each batch grouped by cell and scored only against the queries
    probing that cell. (The earlier pair-explode formulation joined
    every probed vector once PER probing query, copying the vector into
    ~|queries| pair rows — measured slower than brute force at 200k×64
    despite scanning 8× less data.) Recall < 1 when a true neighbor
    lives in an unprobed cell.
    """
    assigned, centers = (
        index
        if index is not None
        else ivf_build(corpus, n_cells, id_col, vec_col, seed)
    )

    # probe list per query: n_probe nearest centroids (queries are small
    # — this is driver-side linear algebra over the centroid matrix)
    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    c_norm = np.linalg.norm(centers, axis=1)
    c_norm[c_norm == 0] = 1.0
    sims_to_cells = (q_mat @ centers.T) / c_norm[None, :]
    # cell → row-indices of the queries probing it (broadcast in closure)
    probe_map: dict[int, list[int]] = {}
    for qi, row in enumerate(sims_to_cells):
        for cell in np.argsort(-row)[:n_probe]:
            probe_map.setdefault(int(cell), []).append(qi)
    probe_map = {c: np.array(v) for c, v in probe_map.items()}

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for cell, grp in pdf.groupby("cell"):
                qidx = probe_map.get(int(cell))
                if qidx is None or not len(grp):
                    continue
                mat = np.array(grp["c_vec"].tolist(), dtype=np.float64)
                norms = np.linalg.norm(mat, axis=1)
                norms[norms == 0] = 1.0
                sims = (mat / norms[:, None]) @ q_mat[qidx].T
                n_local = min(k + 1, sims.shape[0])
                idx = np.argpartition(-sims, n_local - 1, axis=0)[:n_local]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(q_ids[qidx], n_local),
                        "neighbor_id": grp["neighbor_id"].to_numpy()[idx].T.ravel(),
                        "cos_sim": np.take_along_axis(sims, idx, axis=0).T.ravel(),
                    }
                )

    scored = (
        assigned.filter(F.col("cell").isin([int(c) for c in probe_map]))
        .mapInPandas(
            score,
            f"query_id {_id_dtype(queries, id_col)},"
            f" neighbor_id {_id_dtype(assigned, 'neighbor_id')}, cos_sim double",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# Above this vector dimension the candidate-verify cosine switches from
# the interpreted zip_with/aggregate fold to an Arrow-batched numpy
# kernel: HOFs never enter codegen, so their per-pair cost is O(dim)
# interpreted — fine at dim 64, a hot-path tax at real embedding dims
# (768/1536). Below the threshold the fold is kept because its strictly
# sequential summation is bit-identical to the unrolled SQL oracles.
ARROW_COSINE_MIN_DIM = 256


def _pairwise_cosine(pairs: DataFrame, dim: int,
                     force_arrow: bool = False) -> DataFrame:
    """(query_id, q_vec, neighbor_id, c_vec) → (query_id, neighbor_id,
    cos_sim) for candidate pairs that already survived bucketing/probing.

    dim < ARROW_COSINE_MIN_DIM: interpreted sequential fold (engine-exact
    vs the SQL oracles). Otherwise: one numpy pass per Arrow batch — same
    BLAS shape as :func:`cosine_topk`'s scan, applied to the pruned
    candidate set instead of the corpus. ``force_arrow`` takes the numpy
    kernel regardless of dim — right for rows-only ANN paths, where the
    interpreted fold's ~45k pairs/s (vs >1M for the matmul) made IVF
    search SLOWER than brute force at 200k×64; both kernels share the
    cos(0⃗,·)=0 convention so results can't flip."""
    if dim < ARROW_COSINE_MIN_DIM and not force_arrow:
        # try_divide: a zero-norm vector makes the division 0/0, which
        # RAISES under ANSI mode (and would be NaN otherwise, sorting
        # FIRST under desc() and promoting garbage to top-1); define
        # cos(0⃗, ·) = 0.0 to match the Arrow kernel below, so results
        # cannot flip across the dim threshold. Nonzero norms take the
        # ordinary division — bit-identical to the plain fold.
        return pairs.select(
            "query_id",
            "neighbor_id",
            F.coalesce(
                F.try_divide(
                    _seq_dot(F.col("q_vec"), F.col("c_vec")),
                    F.sqrt(_seq_dot(F.col("q_vec"), F.col("q_vec")))
                    * F.sqrt(_seq_dot(F.col("c_vec"), F.col("c_vec"))),
                ),
                F.lit(0.0),
            ).alias("cos_sim"),
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(pdf["q_vec"].tolist(), dtype=np.float64)
            c = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            cn = np.linalg.norm(c, axis=1)
            cn[cn == 0] = 1.0
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cos_sim": (q * c).sum(axis=1) / (qn * cn),
                }
            )

    # id columns keep their incoming types (callers pass arbitrary
    # id_col — a hardcoded `long` would Arrow-fail on string ids)
    narrowed = pairs.select("query_id", "q_vec", "neighbor_id", "c_vec")
    dtypes = dict(narrowed.dtypes)
    return narrowed.mapInPandas(
        kernel,
        f"query_id {dtypes['query_id']}, neighbor_id {dtypes['neighbor_id']},"
        " cos_sim double",
    )


def _seq_dot(a, b) -> F.Column:
    """Strictly left-to-right dot product of two array columns via
    zip_with + aggregate — the fold order matches a hand-unrolled
    ``a1*b1 + a2*b2 + …`` chain, so float results are bit-identical to
    the per-dimension SQL it replaced (numpy's pairwise summation would
    NOT be). Expression size is O(1) in the vector dimension, so real
    embedding dims (768/1536/3072) never approach codegen's 64 KB
    method limit the unrolled form hit at dim ≳ 500."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def random_hyperplane_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH bucketing: sign pattern against ``num_planes`` fixed random
    hyperplanes → integer bucket id. Near vectors collide with high
    probability; ANN search then joins query buckets to corpus buckets
    (with optional multi-probe) instead of scanning everything.

    Each hyperplane is an array LITERAL (constant-folded by Catalyst to
    a single Literal — not rebuilt per row) dotted against the vector
    with :func:`_seq_dot`."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = _seq_dot(F.col(vec_col), plane)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("lsh_bucket", bucket.cast("long"))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    probe_radius: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within matching LSH buckets only.

    Multi-probe: each query additionally probes every bucket within
    ``probe_radius`` bit flips of its own — exploded on the (tiny) query
    side so the corpus join stays a plain equi-join on the bucket id.
    Recall < 1.0 by construction; raise num_planes for tighter buckets,
    probe_radius for recall.
    """
    cb = random_hyperplane_buckets(corpus, dim, num_planes, vec_col=vec_col)
    qb = random_hyperplane_buckets(queries, dim, num_planes, vec_col=vec_col)
    if probe_radius >= 1:
        flips = [F.expr(f"lsh_bucket ^ {1 << p}") for p in range(num_planes)]
        if probe_radius >= 2:
            flips += [
                F.expr(f"lsh_bucket ^ {(1 << p) | (1 << q)}")
                for p in range(num_planes)
                for q in range(p + 1, num_planes)
            ]
        qb = qb.withColumn(
            "lsh_bucket",
            F.explode(F.array_distinct(F.array(F.col("lsh_bucket"), *flips))),
        )
    pairs = (
        qb.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            "lsh_bucket",
        )
        .join(
            cb.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
                "lsh_bucket",
            ),
            "lsh_bucket",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    joined = _pairwise_cosine(pairs, dim=dim, force_arrow=True)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


# ------------------------------------------------------------------ PQ


def _np_kmeans(X: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd's iterations on a driver-side sample — deterministic,
    dependency-free codebook training (the sample is bounded, so this is
    O(sample × k × iters) on the driver, never on the cluster)."""
    rng = np.random.default_rng(seed)
    centers = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        for j in range(len(centers)):
            members = X[labels == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    return centers


def pq_train_codebooks(
    corpus: DataFrame,
    dim: int,
    n_subvectors: int = 8,
    n_codes: int = 32,
    sample_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> np.ndarray:
    """Product-quantization codebooks: split the (L2-normalized) vector
    into ``n_subvectors`` chunks and train one small KMeans codebook per
    chunk on a bounded, deterministic corpus sample.

    Scale shape: the sample is a hash-ordered LIMIT (content-stable, no
    full sort), training happens once on the driver, and the resulting
    (m, n_codes, dim/m) float array is tiny — it ships to executors as a
    closure constant, the same broadcast pattern as the query matrix in
    :func:`cosine_topk`. Returns array of shape (m, n_codes, dim//m).
    """
    assert dim % n_subvectors == 0, "dim must divide evenly into subvectors"
    sub = dim // n_subvectors
    rows = (
        corpus.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample_rows)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    return np.stack(
        [
            _np_kmeans(X[:, m * sub : (m + 1) * sub], n_codes, seed + m)
            for m in range(n_subvectors)
        ]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector its PQ code word (one small int per
    subvector). Vectorized per Arrow batch; output is ``dim/m × log2(k)``
    bits per vector instead of ``dim × 32`` — the compressed index a
    100-TB corpus actually stores and scans."""
    m, n_codes, sub = codebooks.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            X = X / norms[:, None]
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                chunk = X[:, j * sub : (j + 1) * sub]
                # ||x - c||² argmin ≡ argmax(c·x - ||c||²/2): one matmul
                scores = chunk @ codebooks[j].T - 0.5 * (codebooks[j] ** 2).sum(axis=1)
                codes[:, j] = scores.argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, f"vec_id {_id_dtype(corpus, id_col)}, codes array<int>"
    )


def pq_topk_adc(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k by asymmetric distance computation (ADC):
    each query precomputes a (m × n_codes) lookup table of subvector dot
    products against the codebooks; a corpus vector's approximate
    similarity is then m table lookups summed — no float vectors are read
    at scan time, only the code words.

    Same distributed shape as :func:`cosine_topk`: tables broadcast in
    the closure, one vectorized pass per Arrow batch with per-batch
    partial top-k, final window rank over the tiny survivor set.
    """
    m, n_codes, sub = codebooks.shape
    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    # (n_queries, m, n_codes) lookup tables
    luts = np.stack(
        [q_mat[:, j * sub : (j + 1) * sub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (b, m)
            # sims[b, q] = Σ_j luts[q, j, codes[b, j]]
            sims = luts[:, np.arange(m)[None, :], codes[:, :]].sum(axis=2).T
            n_local = min(k + 1, sims.shape[0])
            idx = np.argpartition(-sims, n_local - 1, axis=0)[:n_local]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_local),
                    "neighbor_id": pdf["vec_id"].to_numpy()[idx].T.ravel(),
                    "approx_sim": np.take_along_axis(sims, idx, axis=0).T.ravel(),
                }
            )

    scored = corpus_codes.mapInPandas(
        score,
        f"query_id {_id_dtype(queries, id_col)},"
        f" neighbor_id {_id_dtype(corpus_codes, 'vec_id')}, approx_sim double",
    )
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def pq_topk_rerank(
    corpus: DataFrame,
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    shortlist_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC shortlist → exact rerank: the standard two-stage ANN serving
    shape. The cheap code-word scan nominates ``k × shortlist_factor``
    candidates per query; only those rows' float vectors are fetched
    (an equi-join on id — at scale this is the point: the full-precision
    read is proportional to the shortlist, not the corpus) and reranked
    with exact cosine."""
    shortlist = pq_topk_adc(
        corpus_codes, queries, codebooks, k=k * shortlist_factor,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    # numpy scalars hash-equal their python counterparts, so the lookup
    # works for int AND string ids without forcing a cast
    q_lookup = {
        (q.item() if hasattr(q, "item") else q): q_mat[i]
        for i, q in enumerate(q_ids)
    }
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    cand = shortlist.join(vecs, "neighbor_id")

    def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mat = mat / norms[:, None]
            qm = np.array([q_lookup[q] for q in pdf["query_id"]])
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cos_sim": (mat * qm).sum(axis=1),
                }
            )

    cand_dtypes = dict(cand.dtypes)
    scored = cand.mapInPandas(
        rerank,
        f"query_id {cand_dtypes['query_id']},"
        f" neighbor_id {cand_dtypes['neighbor_id']}, cos_sim double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 4,
    n_subvectors: int = 16,
    n_codes: int = 32,
    shortlist_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the composition serving systems actually deploy — a KMeans
    coarse quantizer prunes the corpus to ``n_probe`` cells, the PQ code
    scan ranks ONLY those cells' residual rows, and the exact rerank
    reads full vectors for the shortlist alone.

    Read volume at scale: (n_probe/n_cells) of the code table (bytes per
    row) + shortlist × float vectors — both knobs independent. Recall is
    bounded by the IVF probe recall times the PQ rerank recall; on the
    synthetic sphere corpus measure ≈ the product of the two pinned
    curves (tests/test_operators.py).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = F.col(vec_col).cast("array<double>")
    corpus_v = corpus.withColumn("__v", array_to_vector(vec))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__v", predictionCol="__cell").fit(
        corpus_v
    )
    assigned = model.transform(corpus_v).select(id_col, vec_col, F.col("__cell"))

    q_ids, q_mat = _collect_queries(queries, id_col, vec_col)
    centers = np.array(model.clusterCenters())
    c_norm = np.linalg.norm(centers, axis=1)
    c_norm[c_norm == 0] = 1.0
    sims_to_cells = (q_mat @ centers.T) / c_norm[None, :]
    probed = {
        int(qid): [int(c) for c in np.argsort(-row)[:n_probe]]
        for qid, row in zip(q_ids, sims_to_cells)
    }
    all_cells = sorted({c for cells in probed.values() for c in cells})
    # sub_corpus feeds pq_encode AND the rerank's vector fetch — without
    # staging, the KMeans transform + cell filter re-run once per
    # consumer (CTE-inlining recompute class). Lazy checkpoint: bounded
    # at (n_probe/n_cells)·corpus rows, materialized by the first
    # caller action inside its own timing.
    sub_corpus = (
        assigned.filter(F.col("__cell").isin(all_cells))
        .drop("__cell")
        .localCheckpoint(eager=False)
    )

    cb = pq_train_codebooks(
        corpus, dim, n_subvectors=n_subvectors, n_codes=n_codes,
        vec_col=vec_col, id_col=id_col, seed=seed,
    )
    codes = pq_encode(sub_corpus, cb, id_col=id_col, vec_col=vec_col)
    return pq_topk_rerank(
        sub_corpus, codes, queries, cb, k=k,
        shortlist_factor=shortlist_factor, id_col=id_col, vec_col=vec_col,
    )


# ------------------------------------------------ SemDeDup-style dedup

def semantic_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.92,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index=None,
) -> DataFrame:
    """SemDeDup-style candidate pairs (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the IVF coarse quantizer,
    then emit cosine-similar pairs WITHIN each cluster only — the
    semantic sibling of the MinHash/SimHash near-dup generators, for
    duplicates that share meaning but not n-grams (translations,
    paraphrases, re-encodes).

    Scale shape: never all-pairs. The within-cluster score is the
    intended O(Σ cᵢ²·d) of the SemDeDup recipe — scale ``n_cells`` with
    the corpus (the paper runs 50k clusters at LAION scale) so cluster
    sizes, and with them per-task memory for the c×c numpy matmul, stay
    bounded. Pairs crossing cluster boundaries are missed — that is the
    method's recall trade, pinned by the subset/recall test. Pass
    ``index`` from :func:`ivf_build` to reuse a trained quantizer.
    """
    if index is not None:
        assigned, _ = index
    elif n_cells == 1:
        # degenerate single cluster = exact all-pairs (KMeans needs k>=2);
        # the equivalence test uses this as the brute-force twin
        assigned = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.lit(0).alias("cell"),
        )
    else:
        assigned, _ = ivf_build(corpus, n_cells, id_col, vec_col, seed)
    id_t = _id_dtype(corpus, id_col)
    schema = f"id_a {id_t}, id_b {id_t}, cos_sim double"

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ids = pdf["neighbor_id"].to_numpy()
        mat = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        nm = mat / norms[:, None]
        sims = nm @ nm.T
        iu = np.triu_indices(len(ids), k=1)
        keep = sims[iu] >= threshold
        a, b = ids[iu[0][keep]], ids[iu[1][keep]]
        return pd.DataFrame({
            "id_a": np.minimum(a, b),
            "id_b": np.maximum(a, b),
            "cos_sim": np.round(sims[iu][keep], 6),
        })

    return assigned.groupBy("cell").applyInPandas(pairs, schema)


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.92,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    index=None,
    train_fraction: float | None = None,
) -> DataFrame:
    """Full SemDeDup: every vector labeled with its ``canonical_id``
    (smallest reachable id through >=threshold cosine edges) and
    ``is_dup``. Keep rows where ``is_dup`` is false to deduplicate.

    Collapse shape: SemDeDup's IVF cells PARTITION the corpus, so every
    similarity edge it considers is within-cell — the global component
    structure IS the per-cell one. Components are therefore computed
    inside the same Arrow task as the similarity matmul (blockwise
    row-band matmul + union-find over the edges it yields), emitting
    ONE row per vector. The previous shape — materialize all pairs,
    then iterative global label propagation (dedup_clusters) — shuffled
    O(edges) rows and ran a multi-round driver loop; at 800k vecs /
    eps=0.35 that was 32M edges and ~1,700 s for byte-identical output
    (r5 verdict #5). Equivalence with the pairs→dedup_clusters path is
    pinned by ``tests/test_similarity.py``.

    Per-task memory is O(block × cell) floats (block=2048), not
    O(cell²); scale ``n_cells`` with the corpus as the SemDeDup recipe
    prescribes so cells stay bounded. The union-find's Python loop runs
    only over component-MERGING edges (≤ cell_size − 1 total): each
    block's edge endpoints are root-resolved VECTORIZED first and
    same-root edges masked out, so dup-dense cells (where almost every
    edge is intra-component after the first block) cost numpy time, not
    Python-per-edge time."""
    if index is not None:
        assigned, _ = index
    elif n_cells == 1:
        assigned = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.lit(0).alias("cell"),
        )
    else:
        assigned, _ = ivf_build(
            corpus, n_cells, id_col, vec_col, seed, train_fraction=train_fraction
        )
    id_t = _id_dtype(corpus, id_col)
    schema = f"{id_col} {id_t}, canonical_id {id_t}, is_dup boolean"

    def collapse(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy()
        n = len(ids)
        if n == 0:
            return pd.DataFrame({id_col: [], "canonical_id": [], "is_dup": []})
        if n == 1:
            return pd.DataFrame(
                {id_col: ids, "canonical_id": ids, "is_dup": [False]}
            )
        mat = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        nm = mat / norms[:, None]
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def roots_of(x: np.ndarray) -> np.ndarray:
            r = parent[x]
            while True:
                p = parent[r]
                if np.array_equal(p, r):
                    return r
                r = p

        block = 2048
        for r0 in range(0, n, block):
            r1 = min(r0 + block, n)
            sims = nm[r0:r1] @ nm.T  # (block, n)
            rows, cols = np.nonzero(sims >= threshold)
            rows = rows + r0
            upper = cols > rows  # i < j once, no self edges
            rows, cols = rows[upper], cols[upper]
            if len(rows) == 0:
                continue
            merging = roots_of(rows) != roots_of(cols)
            for i, j in zip(rows[merging], cols[merging]):
                ri, rj = find(int(i)), find(int(j))
                if ri != rj:
                    parent[rj] = ri
            # full path compression keeps the vectorized chase shallow
            r = parent
            while True:
                p = parent[r]
                if np.array_equal(p, r):
                    break
                r = p
            parent = r
        roots = np.array([find(i) for i in range(n)])
        # canonical = min id within each component
        order = np.argsort(roots, kind="stable")
        canon = np.empty(n, dtype=ids.dtype)
        sorted_roots = roots[order]
        boundaries = np.concatenate(
            ([0], np.nonzero(np.diff(sorted_roots))[0] + 1, [n])
        )
        for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
            members = order[b0:b1]
            canon[members] = ids[members].min()
        return pd.DataFrame(
            {id_col: ids, "canonical_id": canon, "is_dup": canon != ids}
        )

    return assigned.groupBy("cell").applyInPandas(collapse, schema)


# ----------------------------------------- MMR diversified selection


def mmr_select_from_scores(
    spark,
    rel: DataFrame,
    pairs: DataFrame,
    *,
    k_sel: int = 8,
    lam_num: int = 7,
    lam_den: int = 10,
    score_scale: float = 1e7,
) -> DataFrame:
    """Maximal-marginal-relevance greedy selection (Carbonell & Goldstein
    1998) over PRE-SCORED bounded candidate lists — the diversity-aware
    subset selector used for retrieval rerank and diverse-exemplar
    curation.

    ``rel``: (query_id, cand_id, rel_fp BIGINT) — fixed-point relevance
    of each candidate to its probe. ``pairs``: (query_id, d, other,
    sim_fp BIGINT) — fixed-point pairwise sims among the SAME probe's
    candidates (complete directed graph). Selection: argmax rel first,
    then repeatedly argmax of lam_num·rel − (lam_den−lam_num)·
    max_sim_to_selected, ties by ascending cand_id. All arithmetic is
    exact integers, so the selection is deterministic and the DuckDB
    oracle can replay the same greedy declaratively (chained
    materialized-CTE levels — benchqueries/similarity_ops._mmr_oracle).

    Driver state is bounded BY DESIGN: the greedy is inherently
    sequential and tiny (k_sel steps over ≤k_cand candidates), so this
    collects O(|probes|·k_cand²) rows — the distributed heavy part
    (scoring the corpus down to per-probe candidate lists) happened
    upstream. An iterative DataFrame loop would pay ~1.2 s of fixed job
    overhead per step (CLAUDE.md small-graph lesson) for no added
    scalability. The collect is EAGER, so callers' timing captures it
    (bench times builder + action).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    mu = lam_den - lam_num
    rels: dict[int, dict[int, int]] = {}
    for r in rel.select("query_id", "cand_id", "rel_fp").collect():
        rels.setdefault(int(r[0]), {})[int(r[1])] = int(r[2])
    sims: dict[tuple[int, int, int], int] = {
        (int(p[0]), int(p[1]), int(p[2])): int(p[3])
        for p in pairs.select("query_id", "d", "other", "sim_fp").collect()
    }
    out: list[tuple[int, int, int, float]] = []
    for qid in sorted(rels):
        cand = rels[qid]
        selected: list[int] = []
        for step in range(1, min(k_sel, len(cand)) + 1):
            best: tuple[tuple[int, int], int, int] | None = None
            for d, rfp in cand.items():
                if d in selected:
                    continue
                if selected:
                    # complete-directed-graph contract: every
                    # (query, cand, selected) sim must be present. A
                    # silent .get default would diverge from the oracle
                    # (whose inner join DROPS the candidate) — fail loud
                    # and name the missing pair instead.
                    try:
                        m = max(sims[(qid, d, s)] for s in selected)
                    except KeyError as exc:
                        raise ValueError(
                            "mmr_select_from_scores: missing sim pair "
                            f"(query={qid}, cand={d}, selected={exc.args[0][2]}) "
                            "— `pairs` must cover every (query, cand, "
                            "selected) combination"
                        ) from exc
                    score = lam_num * rfp - mu * m
                else:
                    score = lam_num * rfp
                key = (-score, d)
                if best is None or key < best[0]:
                    best = (key, d, score)
            assert best is not None
            _, d, score = best
            selected.append(d)
            # int → float is exact (|score| « 2^53); single IEEE division
            # matches the oracle's CAST(score_fp AS DOUBLE)/scale
            out.append((qid, step, d, float(score) / score_scale))
    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("sel_rank", LongType()),
            StructField("cand_id", LongType()),
            StructField("mmr_score", DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema).orderBy("query_id", "sel_rank")
