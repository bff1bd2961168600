"""Iterative graph algorithms on DataFrames: fixed-point-integer PageRank.

Beyond-reference capability (the reference has no graph surface): rank
nodes of an edge table by weighted PageRank, expressed as a driver-side
loop of pure DataFrame joins/aggregates — the classic Pregel-style
iteration mapped onto Spark SQL. Connected components (operators/dedup
cluster collapse) covers the other common graph need.

Determinism across engines is the interesting part: float PageRank can
never hash-match an oracle (damping multiplies & order-dependent sums),
so ranks are kept in FIXED-POINT INTEGER arithmetic — rank mass starts
at ``scale`` per node and every step is integer multiply / truncating
divide / integer sum, all associative and engine-exact. The DuckDB
oracle unrolls the same iterations as chained CTEs and matches
bit-for-bit (benchqueries/graph_ops.py).

At scale: each iteration is one shuffle (contributions aggregated on
dst) plus one broadcast-able join of the rank vector (|nodes| ≪ |edges|
for web/citation-shaped graphs). The rank frame is re-persisted per
iteration and the loop count is small and fixed — no unbounded lineage
(each iteration's plan reads the materialized previous ranks, the
standard iterative-algorithm pattern on Spark).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 10**12  # rank mass per node; 25 nodes × 1e12 × max-weight ≪ 2^63


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank over (src, dst, w) with integer fixed-point
    ranks; returns (node, rank) after ``iterations`` synchronous steps.

    r'(n) = (100-d)%·scale + d%·Σ_in( r(s)·w(s→n) ÷ totw(s) ), every op
    on BIGINTs with truncating division — bit-identical in any engine,
    any partitioning. Dangling-node mass is dropped (standard simplified
    formulation; re-injection would add one global agg per step).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    )
    deg = e.groupBy("src").agg(F.sum("w").cast("bigint").alias("totw"))
    e = e.join(deg, "src")  # static: weight share denominator rides along
    nodes = (
        e.select(F.col("src").alias("n"))
        .union(e.select(F.col("dst").alias("n")))
        .distinct()
    )
    e = e.persist()
    nodes = nodes.persist()
    base = (100 - damping_pct) * scale // 100

    ranks = nodes.withColumn("r", F.lit(scale).cast("bigint"))
    for _ in range(iterations):
        contrib = (
            e.join(F.broadcast(ranks), e["src"] == ranks["n"])
            .select("dst", F.expr("r * w DIV totw").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
        ranks = (
            nodes.join(F.broadcast(contrib), nodes["n"] == contrib["dst"], "left")
            .select(
                "n",
                # truncating DIV, not `/` (which is double division)
                F.expr(
                    f"CAST({base} + ({damping_pct} * COALESCE(c, 0)) DIV 100 AS BIGINT)"
                ).alias("r"),
            )
        )
        # materialize each step: bounds lineage depth and makes the next
        # join read a small cached rank vector instead of a growing plan
        ranks = ranks.persist()
        ranks.count()
    return ranks
