"""r12 A/B probe: mapInPandas vs mapInArrow for the sorted-array
intersection verify kernel (jaccard_verify_arrow's long pole after the
checkpoint fixes — the kernel math is ~108 ms/10k pairs but the
Arrow→pandas conversion of the two array<long> columns dominates).

mapInArrow reads the pyarrow ListArray buffers directly: values as one
int64 numpy view + offsets, so per-pair slices are zero-copy. Same
np.intersect1d math per pair. Timed best-of-2 ROUND-ROBIN (CLAUDE.md
JIT rule) over the real minhash-pipeline candidate frame at sf0.1.

Usage: python scripts/bench_r12_arrow_kernel.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from nyc_taxi_bigdata_pipeline_spark.operators.dedup import (
    add_minhash,
    hashed_shingles,
    lsh_candidate_pairs,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.sources.tables import load_table


def build_cand(spark, sf_dir, hash_family="portable"):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    sigs = add_minhash(docs, "text", 32, "doc_id", hash_family=hash_family)
    pairs = lsh_candidate_pairs(
        sigs, "doc_id", 32, 8, 256, hash_family
    ).localCheckpoint(eager=True)
    ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = hashed_shingles(
        docs.join(ids, "doc_id", "left_semi"), "doc_id", "text",
        n=5, hash_family=hash_family,
    )
    arrays = (
        sh.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("__h")).alias("__sh"))
        .localCheckpoint(eager=True)
    )
    cand = (
        pairs.join(
            arrays.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__sa")),
            "id_a",
        )
        .join(
            arrays.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__sb")),
            "id_b",
        )
        .localCheckpoint(eager=True)
    )
    print("pairs:", pairs.count(), "cand:", cand.count(), flush=True)
    return cand


def pandas_kernel(cand, threshold=0.8):
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            jac = np.empty(len(pdf), dtype=np.float64)
            sa_l, sb_l = pdf["__sa"].tolist(), pdf["__sb"].tolist()
            for i in range(len(pdf)):
                a, b = sa_l[i], sb_l[i]
                inter = np.intersect1d(a, b, assume_unique=True).size
                jac[i] = inter / (len(a) + len(b) - inter)
            out = pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac}
            )
            yield out[out["jaccard"] >= threshold]

    return cand.mapInPandas(kernel, "id_a long, id_b long, jaccard double")


def arrow_kernel(cand, threshold=0.8):
    from collections.abc import Iterator

    import numpy as np
    import pyarrow as pa

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            sa = batch.column(batch.schema.get_field_index("__sa"))
            sb = batch.column(batch.schema.get_field_index("__sb"))
            # ListArray → flat int64 values + offsets (zero-copy views)
            sa_off = sa.offsets.to_numpy()
            sa_val = sa.values.to_numpy()
            sb_off = sb.offsets.to_numpy()
            sb_val = sb.values.to_numpy()
            jac = np.empty(n, dtype=np.float64)
            for i in range(n):
                a = sa_val[sa_off[i]:sa_off[i + 1]]
                b = sb_val[sb_off[i]:sb_off[i + 1]]
                inter = np.intersect1d(a, b, assume_unique=True).size
                jac[i] = inter / (len(a) + len(b) - inter)
            keep = jac >= threshold
            ia = batch.column(batch.schema.get_field_index("id_a")).to_numpy()
            ib = batch.column(batch.schema.get_field_index("id_b")).to_numpy()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ia[keep], type=pa.int64()),
                    pa.array(ib[keep], type=pa.int64()),
                    pa.array(jac[keep], type=pa.float64()),
                ],
                names=["id_a", "id_b", "jaccard"],
            )

    return cand.mapInArrow(kernel, "id_a long, id_b long, jaccard double")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("bench-r12-arrow-kernel")
    cand = build_cand(spark, args.sf_dir)

    shapes = {
        "mapInPandas": lambda: pandas_kernel(cand),
        "mapInArrow": lambda: arrow_kernel(cand),
    }
    # warm both once (codegen/JIT), then best-of-2 round-robin
    for name, fn in shapes.items():
        noop(fn())
    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for _ in range(2):
        for name, fn in shapes.items():
            dt = noop(fn())
            best[name] = min(best.get(name, float("inf")), dt)
    for name, fn in shapes.items():
        counts[name] = fn().count()
    for name in shapes:
        print(f"{name}: {best[name]:.3f} s, {counts[name]} rows", flush=True)


if __name__ == "__main__":
    main()
