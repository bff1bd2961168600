"""Property-based tests (hypothesis) for the invariants the engine's
correctness rests on — a layer the reference lacks entirely (SURVEY §5).

Driver-side pure logic gets wide random coverage cheaply; Spark-touching
properties run on a few drawn examples per test to keep wall-time sane.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from nyc_taxi_bigdata_pipeline_spark.functions.datetime_parity import (
    month_window,
    sliding_months,
)
from nyc_taxi_bigdata_pipeline_spark.ml.registry import improves_2_of_3
from nyc_taxi_bigdata_pipeline_spark.quality import retention_check

# ----------------------------------------------------- pure driver logic


@given(st.integers(1990, 2100), st.integers(1, 12))
def test_month_window_is_half_open_and_contiguous(y, m):
    start, end = month_window(y, m)
    assert start < end
    ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
    assert end == month_window(ny, nm)[0]  # windows tile the timeline


@given(st.integers(1990, 2100), st.integers(1, 12), st.integers(1, 24))
def test_sliding_months_chain(y, m, n):
    months = sliding_months(y, m, n)
    assert len(months) == n
    seq = months + [(y, m)]
    for (ya, ma), (yb, mb) in zip(seq, seq[1:]):
        assert (yb, mb) == ((ya + 1, 1) if ma == 12 else (ya, ma + 1))


@given(st.integers(0, 10**9), st.integers(0, 10**9))
def test_retention_check_monotone(a, b):
    r = retention_check(a, b)
    assert r.status in {"PASS", "WARN", "FAIL"}
    if a and b >= a * 0.9:
        assert r.status == "PASS"
    if a and b < a * 0.8:
        assert r.status == "FAIL"


@given(
    st.fixed_dictionaries(
        {"rmse": st.floats(0.1, 100), "mae": st.floats(0.1, 100), "r2": st.floats(-1, 1)}
    ),
    st.fixed_dictionaries(
        {"rmse": st.floats(0.1, 100), "mae": st.floats(0.1, 100), "r2": st.floats(-1, 1)}
    ),
)
def test_promotion_rule_antisymmetric_on_strict_orders(cand, cur):
    """If the candidate strictly wins all three, it must promote; if it
    strictly loses all three, it must not. (Middle cases are the 2-of-3
    judgment call.)"""
    if cand["rmse"] < cur["rmse"] and cand["mae"] < cur["mae"] and cand["r2"] > cur["r2"]:
        assert improves_2_of_3(cand, cur)
    if cand["rmse"] > cur["rmse"] and cand["mae"] > cur["mae"] and cand["r2"] < cur["r2"]:
        assert not improves_2_of_3(cand, cur)


# ------------------------------------------- cross-engine hash portability


@settings(max_examples=30, suppress_health_check=[HealthCheck.too_slow])
@given(st.text(min_size=0, max_size=200))
def test_h64_portable_across_engines(s):
    """The md5→int64 hash must agree between DuckDB and Python's hashlib
    (the ground truth both engines implement)."""
    import duckdb
    import hashlib

    expected = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    got = duckdb.sql(
        "SELECT CAST(CONCAT('0x', SUBSTRING(MD5(?), 1, 15)) AS BIGINT)", params=[s]
    ).fetchone()[0]
    assert got == expected
    assert 0 <= got < 2**63  # 60 bits → always a valid positive BIGINT


# -------------------------------------------------- Spark-backed invariants


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)), max_size=10),
)
def test_anti_dup_append_invariants(spark, rows, existing_keys):
    """After anti_dup_append: (1) no incoming key that already exists is
    appended, (2) appended keys are unique, (3) appending the result to
    existing and re-running yields nothing new (idempotency)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.upsert import anti_dup_append

    inc = spark.createDataFrame(rows, "k1 int, k2 int, payload int")
    ex = (
        spark.createDataFrame([(a, b, -1) for a, b in existing_keys],
                              "k1 int, k2 int, payload int")
        if existing_keys
        else None
    )
    out = anti_dup_append(inc, ex, ["k1", "k2"])
    got = [(r["k1"], r["k2"]) for r in out.collect()]
    assert len(got) == len(set(got))  # unique on NK
    if existing_keys:
        assert not (set(got) & set(existing_keys))  # nothing pre-existing
    merged = out if ex is None else ex.unionByName(out)
    again = anti_dup_append(inc, merged, ["k1", "k2"])
    assert again.count() == 0  # idempotent


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=50,
    )
)
def test_decimal_sum_matches_python_exact(spark, xs):
    """The exact-decimal SUM strategy must equal Python's exact Fraction
    arithmetic for any 2-decimal inputs, regardless of partitioning."""
    from fractions import Fraction

    df = spark.createDataFrame([(x,) for x in xs], "x double").repartition(7)
    got = df.selectExpr(
        "CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS s"
    ).first()["s"]
    want = float(sum(Fraction(str(round(x, 2))) for x in xs))
    assert math.isclose(got, want, rel_tol=0, abs_tol=0) or got == want


# ----------------------------------------------------- SCD2 invariants


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),                      # key
            st.sampled_from(["a", "b", "c"]),       # attr value
            st.integers(1, 1000),                   # eff day offset
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: (t[0], t[2]),           # one update per (key, eff)
    )
)
def test_scd2_invariants_hold_for_random_batches(spark, batch):
    """For ANY update batch: exactly one current row per key, validity
    intervals per key tile without overlap, and re-applying the same
    batch is a no-op."""
    import datetime as dt

    from nyc_taxi_bigdata_pipeline_spark.operators import scd

    dim = spark.createDataFrame(
        [(k, "init") for k in range(1, 7)], "k long, attr string"
    )
    t = scd.scd2_init(dim, "k", ["attr"], "2020-01-01")
    updates = spark.createDataFrame(
        [
            (k, v, dt.date(2020, 1, 1) + dt.timedelta(days=off))
            for k, v, off in batch
        ],
        "k long, attr string, eff_date date",
    )
    out = scd.scd2_apply(t, updates, "k", ["attr"]).cache()

    rows = out.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    for k, krows in by_key.items():
        currents = [r for r in krows if r["is_current"]]
        assert len(currents) == 1, (k, krows)
        ordered = sorted(krows, key=lambda r: r["valid_from"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["valid_to"] == b["valid_from"], (k, ordered)  # tiling
            assert a["valid_from"] < a["valid_to"]

    again = scd.scd2_apply(out, updates, "k", ["attr"])
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in rows}
    out.unpersist()


# ------------------------------------------- incremental view maintenance


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_ivm_equals_full_recompute(spark, data):
    """Join-view delta + agg-view merge over random insert batches must
    land exactly where a from-scratch recompute lands."""
    import pandas as pd

    from nyc_taxi_bigdata_pipeline_spark.operators import ivm

    keys = st.integers(0, 6)
    rows = lambda: data.draw(
        st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=25)
    )
    a0, da = rows(), rows()
    b0, db = rows(), rows()

    def df(pairs, val):
        return spark.createDataFrame(
            pd.DataFrame(pairs or [(99, 0)], columns=["k", val]).iloc[: len(pairs)],
            f"k bigint, {val} bigint",
        )

    A0, dA, B0, dB = df(a0, "va"), df(da, "va"), df(b0, "vb"), df(db, "vb")

    # --- join view
    v0 = A0.join(B0, "k")
    delta = ivm.join_view_delta(A0, dA, B0, dB, "k")
    incr = sorted(map(tuple, v0.unionByName(delta).collect()))
    full = sorted(map(tuple, A0.unionByName(dA).join(B0.unionByName(dB), "k").collect()))
    assert incr == full

    # --- agg view
    import pyspark.sql.functions as F

    def gview(d):
        return d.groupBy("k").agg(
            F.sum("va").alias("s"),
            F.min("va").alias("lo"),
            F.max("va").alias("hi"),
            F.count("*").cast("bigint").alias("cnt"),
        )

    v = gview(A0)
    # delta rows carry raw column names — rename to the view's agg names
    merged = ivm.agg_view_merge(
        v,
        dA.select("k", F.col("va").alias("s"), F.col("va").alias("lo"), F.col("va").alias("hi")),
        ["k"],
        sum_cols=["s"],
        min_cols=["lo"],
        max_cols=["hi"],
        count_col="cnt",
    )
    incr_a = sorted(map(tuple, merged.collect()))
    full_a = sorted(map(tuple, gview(A0.unionByName(dA)).collect()))
    assert incr_a == full_a


def _span_dedup_reference(docs: list[tuple[int, str]], k: int = 8):
    """Pure-Python reference for operators/curation.span_dedup_remove:
    duplicated k-token windows keep their corpus-wide first occurrence
    (by (doc_id, pos)); other occurrences mark positions; marks merge
    when starts are <= k apart; marked tokens drop."""
    toks = {d: t.lower().strip().split(" ") for d, t in docs}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(1, len(ts) - k + 2):
            occ.setdefault(tuple(ts[p - 1 : p - 1 + k]), []).append((d, p))
    marks: dict[int, list[int]] = {}
    for positions in occ.values():
        if len(positions) > 1:
            for d, p in sorted(positions)[1:]:
                marks.setdefault(d, []).append(p)
    out = {}
    for d, ts in toks.items():
        ps = sorted(set(marks.get(d, [])))
        spans, rm = [], 0
        for p in ps:
            if spans and p - spans[-1][1] <= k:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + k))
        rm = len(covered)
        kept = [t for i, t in enumerate(ts, start=1) if i not in covered]
        out[d] = (len(ts), len(spans), rm, " ".join(kept))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=40).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(2, 5),
)
def test_span_dedup_matches_pure_python_reference(spark, texts, k):
    """Randomized corpora over a 7-token alphabet (dense window
    collisions by construction) — the Spark operator must agree with
    the reference on every doc's (n_tokens, spans, removed, clean_text)."""
    from nyc_taxi_bigdata_pipeline_spark.operators.curation import (
        span_dedup_remove,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_spans, r.tokens_removed, r.clean_text)
        for r in span_dedup_remove(df, k=k).collect()
    }
    want = _span_dedup_reference(docs, k=k)
    assert got == want


def _lm_nll_reference(texts: list[str], k_unused=None):
    """Pure-Python reference for text_lm_perplexity's per-doc NLL:
    add-one bigram LM with BOS context, every ln snapped to integer
    micro-nats exactly like _fp_ln."""
    import math

    def fp_ln(x: int) -> int:
        return math.floor(math.log(float(x)) * 1_000_000.0 + 0.5)

    toks = {i: t.lower().strip().split(" ") for i, t in enumerate(texts)
            if t.strip()}
    BOS = None
    cbi: dict[tuple, int] = {}
    cctx: dict[object, int] = {}
    vocab = set()
    for ts in toks.values():
        prev = BOS
        for w in ts:
            cbi[(prev, w)] = cbi.get((prev, w), 0) + 1
            cctx[prev] = cctx.get(prev, 0) + 1
            vocab.add(w)
            prev = w
    v = len(vocab)
    out = {}
    for d, ts in toks.items():
        prev, nll = BOS, 0
        for w in ts:
            nll += fp_ln(cctx[prev] + v) - fp_ln(cbi[(prev, w)] + 1)
            prev = w
        out[d] = (len(ts), nll)
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=20)
        .map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=10,
    )
)
def test_lm_perplexity_matches_pure_python_reference(spark, texts):
    """Randomized corpora over a 4-token alphabet: the shared-SQL bigram
    LM (run Spark-side over a temp view, exactly as the registry query
    stages it) must produce the same per-doc exact micro-nat NLL sums as
    an independent reference — pins BOS handling, add-one smoothing, and
    the fp_ln snap."""
    from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
    from nyc_taxi_bigdata_pipeline_spark.benchqueries.text_ops import _lm_bi_sql

    docs = [(i, t, "s") for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    df.createOrReplaceTempView("prop_lm_docs")
    bi = spark.sql(_lm_bi_sql(D.SPARK, "prop_lm_docs"))
    bi.createOrReplaceTempView("prop_lm_bi")
    got = {
        r.doc_id: (r.n, r.nll)
        for r in spark.sql(
            """WITH cbi AS (SELECT p_h, w_h, COUNT(*) AS c FROM prop_lm_bi GROUP BY p_h, w_h),
            cctx AS (SELECT p_h, COUNT(*) AS c FROM prop_lm_bi GROUP BY p_h),
            vocab AS (SELECT COUNT(DISTINCT w_h) AS v FROM prop_lm_bi)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(
                     CAST(FLOOR(LN(CAST(x.c + vocab.v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
                   - CAST(FLOOR(LN(CAST(c.c + 1 AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
                   ) AS BIGINT) AS nll
            FROM prop_lm_bi b
            JOIN cbi c ON c.p_h = b.p_h AND c.w_h = b.w_h
            JOIN cctx x ON x.p_h = b.p_h
            CROSS JOIN vocab GROUP BY doc_id"""
        ).collect()
    }
    want = _lm_nll_reference(texts)
    assert got == want


# --------------------------------------------------------------------------
# BPE DuckDB-oracle replay vs the pure-Python reference trainer
# (tests/test_operators._ref_learn_bpe pins Spark's learn_bpe; this pins
# the r11 chained-CTE DuckDB replay used as the driver oracle — no Spark
# involved, so the property can afford real example volume). The word
# strategy is repeat-heavy over a 2-letter alphabet to hammer the a=b
# merge case, whose greedy left-to-right overlap semantics are the
# gaps-and-islands + odd-parity part of the SQL.

_bpe_word = st.text(alphabet="ab", min_size=1, max_size=6)
_bpe_doc = st.lists(_bpe_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(_bpe_doc, min_size=1, max_size=6),
    n_merges=st.integers(min_value=1, max_value=8),
    with_null=st.booleans(),
)
def test_bpe_duckdb_oracle_matches_reference(docs, n_merges, with_null):
    import duckdb
    import pandas as pd

    from nyc_taxi_bigdata_pipeline_spark.benchqueries.text_ops import (
        _bpe_merges_oracle,
    )
    from tests.test_operators import _ref_learn_bpe

    texts: list[str | None] = list(docs) + ([None] if with_null else [])
    pdf = pd.DataFrame({"text": pd.Series(texts, dtype="object")})
    con = duckdb.connect()
    con.register("documents", pdf)
    got = con.execute(_bpe_merges_oracle("documents", n_merges)).fetchall()
    con.close()

    freqs: dict[str, int] = {}
    for t in docs:
        for w in t.lower().split():
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    want = _ref_learn_bpe(freqs, n_merges)
    assert [(r[1], r[2], r[4]) for r in got] == want
    assert [r[0] for r in got] == list(range(1, len(want) + 1))
    assert all(r[3] == r[1] + r[2] for r in got)
