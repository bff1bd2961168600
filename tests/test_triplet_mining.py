"""Semantic pins for triplet mining beyond the oracle hash: the
semi-hard flag must be reconstructible from the output's own cosine
columns, and the mined band must be non-vacuous on the testdata."""

from __future__ import annotations

from nyc_taxi_bigdata_pipeline_spark.benchqueries.similarity_ops import (
    _TRIP_ANCHORS,
    _TRIP_K_NEG,
    _TRIP_MARGIN_FP,
    similarity_triplet_mining,
)


def test_triplet_output_invariants(spark, sf_dir):
    rows = similarity_triplet_mining(spark, sf_dir).collect()
    assert len(rows) == _TRIP_ANCHORS * _TRIP_K_NEG
    by_a: dict[int, list] = {}
    for r in rows:
        by_a.setdefault(r.anchor_id, []).append(r)
    assert len(by_a) == _TRIP_ANCHORS
    saw_semi_hard = False
    for a, group in by_a.items():
        group.sort(key=lambda r: r.neg_rank)
        assert [r.neg_rank for r in group] == list(range(1, _TRIP_K_NEG + 1))
        # negatives ordered hardest-first, one shared positive per anchor
        fps = [round(r.cos_neg * 1e6) for r in group]
        assert fps == sorted(fps, reverse=True)
        assert len({r.cos_pos for r in group}) == 1
        pos_fp = round(group[0].cos_pos * 1e6)
        for r in group:
            neg_fp = round(r.cos_neg * 1e6)
            want = pos_fp - _TRIP_MARGIN_FP <= neg_fp < pos_fp
            assert r.semi_hard == want, (a, r.negative_id)
            saw_semi_hard |= r.semi_hard
    assert saw_semi_hard, "margin band vacuous on testdata"
