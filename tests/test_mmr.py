"""Semantic pins for MMR diversified selection beyond the oracle hash:
the greedy must actually TRADE relevance for diversity (the defining
behavior), and the candidate-builder plan must keep the bounded probe
side as the broadcast build side."""

from __future__ import annotations

from pyspark.sql.types import LongType, StructField, StructType

from nyc_taxi_bigdata_pipeline_spark.benchqueries.similarity_ops import (
    _mmr_cand_sql,
)
from nyc_taxi_bigdata_pipeline_spark.benchqueries import dialect as D
from nyc_taxi_bigdata_pipeline_spark.operators.similarity import (
    mmr_select_from_scores,
)
from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


def _frames(spark, rel_rows, pair_rows):
    rel_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("cand_id", LongType()),
            StructField("rel_fp", LongType()),
        ]
    )
    pair_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("d", LongType()),
            StructField("other", LongType()),
            StructField("sim_fp", LongType()),
        ]
    )
    return (
        spark.createDataFrame(rel_rows, rel_schema),
        spark.createDataFrame(pair_rows, pair_schema),
    )


def test_mmr_trades_relevance_for_diversity(spark):
    """A=top relevance, B=slightly less relevant NEAR-DUP of A,
    C=moderately relevant but diverse. Pure relevance ranks A,B,C; MMR
    at lambda=0.7 must select A, then C (B's similarity to A outweighs
    its relevance edge), then B."""
    A, B, C = 10, 11, 12
    rel = [(0, A, 900_000), (0, B, 890_000), (0, C, 520_000)]
    sym = {
        (A, B): 990_000,  # near-dup pair
        (A, C): 100_000,
        (B, C): 100_000,
    }
    pairs = []
    for (x, y), s in sym.items():
        pairs += [(0, x, y, s), (0, y, x, s)]
    rel_df, pairs_df = _frames(spark, rel, pairs)
    out = mmr_select_from_scores(
        spark, rel_df, pairs_df, k_sel=3, lam_num=7, lam_den=10
    ).collect()
    assert [(r.sel_rank, r.cand_id) for r in out] == [(1, A), (2, C), (3, B)]
    # step-2 scores are the exact integer tradeoff, replayable by hand:
    # C: 7*520000 - 3*100000 = 3_340_000 > B: 7*890000 - 3*990000 = 3_260_000
    assert out[1].mmr_score == 3_340_000 / 1e7
    assert out[2].mmr_score == (7 * 890_000 - 3 * 990_000) / 1e7


def test_mmr_first_pick_is_pure_relevance_with_id_tiebreak(spark):
    rel = [(0, 5, 100), (0, 3, 100), (0, 7, 99)]
    pairs = []
    for x in (5, 3, 7):
        for y in (5, 3, 7):
            if x != y:
                pairs.append((0, x, y, 0))
    rel_df, pairs_df = _frames(spark, rel, pairs)
    out = mmr_select_from_scores(spark, rel_df, pairs_df, k_sel=1).collect()
    assert [(r.sel_rank, r.cand_id) for r in out] == [(1, 3)]


def test_mmr_k_sel_clamps_to_candidate_count(spark):
    rel = [(0, 1, 10), (0, 2, 5)]
    pairs = [(0, 1, 2, 3), (0, 2, 1, 3)]
    rel_df, pairs_df = _frames(spark, rel, pairs)
    out = mmr_select_from_scores(spark, rel_df, pairs_df, k_sel=8).collect()
    assert [r.cand_id for r in out] == [1, 2]


def test_mmr_cand_plan_builds_on_probe_side(spark, sf_dir):
    """The candidate generator's nested-loop join must broadcast the
    3-probe side, never the corpus (the static-size OOM class) — pinned
    here because the registry-wide BNLJ guard only sees the literal
    frame the MMR query RETURNS, not this internal builder plan."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "t_mmr_plan_emb"
    )
    plan = physical_plan(spark.sql(_mmr_cand_sql(D.SPARK, "t_mmr_plan_emb")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # the broadcast exchange feeds from the probe IN-list filter
    import re

    bcast = plan[plan.index("BroadcastExchange"):]
    assert re.search(r"vec_id.* IN \(0,\s*1,\s*2\)", bcast), bcast[:800]
