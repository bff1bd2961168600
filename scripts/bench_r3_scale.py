"""Round-3 scale probes: SCD2 and PageRank at ≥10× their bench volume,
plus the non-broadcast (shuffle-join) PageRank path on a 1M-node graph.

Inputs come from the FK-consistent 10×-salted directory produced by
scripts/make_scaled_testdata.py (default /tmp/sf1x10): the SCD2 and
nations-PageRank probes are the exact registry query shapes, just fed
10× the rows, so the ratio vs the sf0.1 bench number is a direct
linearity check. The big-graph probe is synthetic (1M nodes, 10M
edges) because no salted star schema yields a high-node-count graph —
it exercises the round-3 conditional-broadcast fallback where the rank
vector is shuffle-joined instead of broadcast.

Usage: python scripts/bench_r3_scale.py [--sf-dir /tmp/sf1x10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
from nyc_taxi_bigdata_pipeline_spark.operators.graph import pagerank_fixed_point
from nyc_taxi_bigdata_pipeline_spark.session import get_spark


def timed(label: str, fn) -> float:
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label}: {dt:.1f} s -> {out} rows")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1x10")
    ap.add_argument("--iters", type=int, default=2, help="timed passes per probe (min reported)")
    args = ap.parse_args()

    spark = get_spark("bench-r3-scale")

    # registry shapes at 1× (sf0.1) then 10×: ratio ≈ 10 means linear
    for name in ("scd2_customer_segments", "graph_pagerank_nations"):
        q = REGISTRY[name]
        q.spark_fn(spark, "/root/testdata/sf0.001").collect()  # warm codegen
        time.sleep(3)
        for label, d in ((f"{name} @sf0.1", "/root/testdata/sf0.1"), (f"{name} @10x", args.sf_dir)):
            best = min(
                timed(f"{label} pass{i}", lambda: q.spark_fn(spark, d).count())
                for i in range(args.iters)
            )
            print(f"{label}: best {best:.1f} s")

    # 1M-node / 10M-edge synthetic graph: nodes exceed any sane driver
    # broadcast at real scale, so force the shuffle-equi-join rank path
    n_nodes, n_edges = 1_000_000, 10_000_000
    edges = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        ((F.col("id") * 2654435761) % n_nodes).alias("dst"),
        (F.col("id") % 5 + 1).alias("w"),
    )
    for label, bmax in (("broadcast", None), ("shuffle-join", 0)):
        kwargs = {} if bmax is None else {"broadcast_nodes_max": bmax}
        best = min(
            timed(
                f"pagerank 1M-node/10M-edge 3-iter [{label}] pass{i}",
                lambda: pagerank_fixed_point(edges, iterations=3, **kwargs).count(),
            )
            for i in range(args.iters)
        )
        print(f"pagerank big-graph [{label}]: best {best:.1f} s")


if __name__ == "__main__":
    main()
