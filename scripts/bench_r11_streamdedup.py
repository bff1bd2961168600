"""Scale probe for streaming/sinks.foreach_batch_dedup_maintain: the
claim that matters at ingest scale is that PER-BATCH cost tracks the
BATCH (signature pass + banded index join + candidate-only verify +
two bounded view merges), not the accumulated corpus — the whole point
of persisting the band index. Three consecutive 100k-doc micro-batch
runs against a corpus growing 0 → ~190k docs; each batch carries ~5%
replays of earlier batches (cross-batch contamination) and ~5%
within-batch dups. Collect + checksum per the probe rules.

Usage: python scripts/bench_r11_streamdedup.py [--docs N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from nyc_taxi_bigdata_pipeline_spark.streaming import sinks


def synth_batch(spark, n: int, batch_no: int):
    """Batch b covers ids [b*n, (b+1)*n); ~5% of rows replay a doc from
    the PREVIOUS batch (same text, new id → cross-batch near-dup) and
    ~5% duplicate a neighbor within the batch."""
    toks = ", ".join(
        f"concat('w', abs(xxhash64(src_id, {i}, 31)) % 50000)" for i in range(30)
    )
    return spark.range(batch_no * n, (batch_no + 1) * n).selectExpr(
        "id AS doc_id",
        # replay: borrow the text-seed of (id - n - 7) from last batch;
        # in-batch dup: borrow the neighbor's seed
        f"""CASE WHEN id % 20 = 3 AND id >= {n} THEN id - {n} - 7
                 WHEN id % 20 = 11 THEN id - 1
                 ELSE id END AS src_id""",
    ).selectExpr("doc_id", f"concat_ws(' ', {toks}) AS text")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000, help="docs per batch")
    args = ap.parse_args()
    spark = get_spark("bench-r11-streamdedup")
    root = tempfile.mkdtemp(prefix="streamdedup_")
    src = os.path.join(root, "src")
    corpus, index = os.path.join(root, "corpus"), os.path.join(root, "index")
    ckpt = os.path.join(root, "ckpt")
    try:
        for b in range(3):
            synth_batch(spark, args.docs, b).write.mode("overwrite").parquet(
                os.path.join(src, f"p{b}")
            )
            stream = spark.readStream.schema("doc_id long, text string").parquet(
                src + "/*"
            )
            t0 = time.time()
            q = sinks.foreach_batch_dedup_maintain(
                stream, corpus, index, ckpt, threshold=0.8
            )
            q.awaitTermination(600)
            q.stop()
            dt = time.time() - t0
            cdf = spark.read.parquet(corpus)
            survivors = cdf.count()
            checksum = cdf.selectExpr("sum(doc_id) s").first()["s"]
            idx_rows = spark.read.parquet(index).count()
            print(
                f"batch {b} (+{args.docs} docs, corpus now {survivors}): "
                f"{dt:.1f} s, index {idx_rows} rows, id-checksum {checksum}"
            )
            assert idx_rows == survivors * 8
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
