"""Semantic pins for search_hybrid_rrf beyond the DuckDB oracle hash:
the fusion arithmetic must be reconstructible from the output itself,
and the output must satisfy the structural RRF invariants (rank shape,
arm membership, deterministic tiebreaks)."""

from __future__ import annotations

import math

from nyc_taxi_bigdata_pipeline_spark.benchqueries.search_ops import (
    _RRF_C,
    _RRF_FUSE_K,
    _RRF_OUT_K,
    _RRF_PROBES,
    search_hybrid_rrf,
)


def _rrf_fp(rank) -> int:
    if rank is None:
        return 0
    return int(math.floor(1e9 / float(_RRF_C + int(rank)) + 0.5))


def test_rrf_output_invariants(spark, sf_dir):
    rows = search_hybrid_rrf(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(_RRF_PROBES)
    for qid, group in by_q.items():
        group.sort(key=lambda r: r.rank)
        assert [r.rank for r in group] == list(range(1, _RRF_OUT_K + 1))
        # fused keys: (score DESC, cand_id ASC), no probe self-retrieval
        keys = [(-r.rrf_score, r.cand_id) for r in group]
        assert keys == sorted(keys), qid
        assert all(r.cand_id != qid for r in group)
        for r in group:
            # every fused row came from at least one arm's top-K list
            assert r.r_lex is not None or r.r_sem is not None
            if r.r_lex is not None:
                assert 1 <= r.r_lex <= _RRF_FUSE_K
            if r.r_sem is not None:
                assert 1 <= r.r_sem <= _RRF_FUSE_K
            # the score is exactly the fixed-point fusion of its own ranks
            want = (_rrf_fp(r.r_lex) + _rrf_fp(r.r_sem)) / 1e9
            assert r.rrf_score == want, (qid, r.cand_id)


def test_rrf_both_arms_contribute(spark, sf_dir):
    """Fusion is only meaningful if neither arm degenerates: across the
    fused top-k there must be rows ranked by BOTH arms and the two arms
    must not be rank-identical everywhere (lexical and semantic views of
    the synthetic corpus genuinely differ)."""
    rows = search_hybrid_rrf(spark, sf_dir).collect()
    both = [r for r in rows if r.r_lex is not None and r.r_sem is not None]
    assert both, "no candidate ranked by both arms in any fused top-k"
    assert any(r.r_lex != r.r_sem for r in both)
