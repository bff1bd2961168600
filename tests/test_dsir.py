"""Semantic pin for DSIR importance-resampling selection beyond the
oracle hash: the selection must actually STEER toward the target
domain (the method's defining behavior)."""

from __future__ import annotations

from nyc_taxi_bigdata_pipeline_spark.benchqueries.curation_ops import (
    _DSIR_TARGET_SRC,
    _DSIR_TOP,
    curation_dsir_select,
)


def test_dsir_selection_steers_toward_target(spark, sf_dir):
    """Every source holds a 1/20 share of the corpus; if DSIR works the
    target source must dominate the top-k far beyond its base rate
    (measured 13/20 at sf0.01 — assert a loose half to stay robust to
    testdata regeneration)."""
    rows = curation_dsir_select(spark, sf_dir).collect()
    assert len(rows) == _DSIR_TOP
    n_target = sum(1 for r in rows if r.source == _DSIR_TARGET_SRC)
    assert n_target >= _DSIR_TOP // 2, (
        f"only {n_target}/{_DSIR_TOP} selected docs come from "
        f"{_DSIR_TARGET_SRC} — no steering"
    )
    # exact-integer ordering contract: sorted by (sum_lw DESC, doc_id)
    keys = [(-r.sum_lw, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # the fixed-point export is the one declared division
    for r in rows:
        assert r.dsir_logweight == r.sum_lw / 1e6
