"""token_budget_prefix vs a pure-Python prefix walk: the boundary and
the KEPT SET must match exactly on adversarial shapes — heavy score
ties (Phase B), heavy-tail weights, multi-level refinement (tiny
n_bins/leaf_rows), and the budget edges."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from nyc_taxi_bigdata_pipeline_spark.operators.budget import (
    token_budget_prefix,
)


def _ref_prefix(rows, budget):
    """(kept_ids, kept_weight) by the definition: order (score DESC,
    id ASC), keep while cumulative ≤ budget, stop at first overflow."""
    kept, cum = [], 0
    for s, i, w in sorted(rows, key=lambda x: (-x[0], x[1])):
        if cum + w <= budget:
            cum += w
            kept.append(i)
        else:
            break
    return set(kept), cum


def _df(spark, rows):
    schema = StructType(
        [
            StructField("score", LongType()),
            StructField("doc_id", LongType()),
            StructField("tokens", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(s, i, w) for s, i, w in rows], schema
    ).repartition(8)


def _splitmix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
    return z ^ (z >> 31)


def _check(spark, rows, budget, **kw):
    ref_kept, ref_w = _ref_prefix(rows, budget)
    df = _df(spark, rows)
    b = token_budget_prefix(
        df,
        score_col="score",
        id_col="doc_id",
        weight_col="tokens",
        budget=budget,
        **kw,
    )
    got = {
        r.doc_id
        for r in df.where(b.kept_predicate("score", "doc_id")).collect()
    }
    assert got == ref_kept, (budget, sorted(got ^ ref_kept)[:10])
    assert b.kept_weight == ref_w
    assert b.kept_docs == len(ref_kept)
    assert b.total_docs == len(rows)
    assert b.total_weight == sum(w for _, _, w in rows)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_budget_prefix_random(spark, seed):
    rows = []
    for i in range(3000):
        h = _splitmix(seed * 1_000_003 + i)
        score = h % 37          # heavy ties
        w = 1 + (h >> 8) % 50
        if h % 97 == 0:
            w *= 500            # heavy-tail weights
        rows.append((score, i, w))
    total = sum(w for _, _, w in rows)
    for budget in (0, 1, total // 100, total // 3, (total * 9) // 10,
                   total, total + 5):
        _check(spark, rows, budget, n_bins=4, leaf_rows=16)


def test_budget_prefix_all_one_score(spark):
    """Pure Phase B: every doc ties on score, boundary is id-refined."""
    rows = [(7, i, 10 + (i % 3)) for i in range(2000)]
    total = sum(w for _, _, w in rows)
    for budget in (0, 5, 1000, total // 2, total - 1, total):
        _check(spark, rows, budget, n_bins=4, leaf_rows=16)


def test_budget_prefix_single_giant_doc_overflow(spark):
    """A single doc bigger than the whole remaining budget must stop
    the prefix exactly before itself (the ilo==ihi overflow branch)."""
    rows = [(5, 1, 10), (5, 2, 10_000), (5, 3, 10), (4, 4, 10)]
    _check(spark, rows, 25, n_bins=2, leaf_rows=1)
    _check(spark, rows, 9, n_bins=2, leaf_rows=1)   # nothing fits
    _check(spark, rows, 10, n_bins=2, leaf_rows=1)  # only doc 1


def test_budget_fraction_floor(spark):
    rows = [(i, i, 7) for i in range(10)]  # total 70
    df = _df(spark, rows)
    b = token_budget_prefix(
        df, score_col="score", id_col="doc_id", weight_col="tokens",
        budget_fraction=(6, 10), n_bins=4, leaf_rows=4,
    )
    assert b.budget == 42
    ref_kept, ref_w = _ref_prefix(rows, 42)
    assert b.kept_weight == ref_w and b.kept_docs == len(ref_kept)
