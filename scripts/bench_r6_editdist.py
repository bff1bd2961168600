"""Edit-distance self-join scale probe (the evidence the operator
docstring cites): PassJoin segment blocking measured in BOTH candidate
regimes, 10x apart per tier.

- SELECTIVE corpus: mixed-format tokens built from a hashed hex core
  (`a3f("x7")9c-41`-ish) — every segment is high-entropy, so segment
  buckets stay near-singleton and candidates grow ~linearly with docs.
  True pairs exist by construction: ~8% of strings are replicas of an
  earlier string with one character substituted (ed=1) and ~4% are
  byte-identical replicas (ed=0).
- ADVERSARIAL corpus: TPC-H-style `Customer#000000042` names — the
  9-char constant prefix makes the first segment match EVERYTHING of a
  compatible length, so candidates degenerate toward the length band
  (quadratic in the band population). This is the documented saturation
  boundary, same failure mode as low-n shingles in jaccard_join_prefix;
  the probe exists to measure where that cliff sits, not to hide it.

Per tier we report: candidates generated, verified pairs, wall seconds,
and pairs/s over candidates (the verify throughput). Pass bar:
selective-corpus candidates and time scale ~linearly 10x -> 100x; the
adversarial corpus is run only at the two small tiers (its candidate
count is the quadratic cliff by design).

Usage: python scripts/bench_r6_editdist.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.operators.editdist import (
    levenshtein_candidates,
    levenshtein_self_join,
)
from nyc_taxi_bigdata_pipeline_spark.session import get_spark
from scripts.bench_r4_skew import timed


def selective_corpus(spark, n: int):
    """High-entropy tokens + seeded ed<=1 replicas, fully deterministic
    (xxhash64-derived, no RNG state, partition-invariant)."""
    base = spark.range(n).select(
        F.col("id"),
        # hex core from two hashes -> 16 hex chars, then punctuated
        F.concat(
            F.substring(F.hex(F.xxhash64("id", F.lit(1))), 1, 6),
            F.lit("-"),
            F.substring(F.hex(F.xxhash64("id", F.lit(2))), 1, 6),
        ).alias("s0"),
    )
    # ~8% substitute one char (ed=1 vs source), ~4% exact replica (ed=0).
    # Replicas point at id - (id % 25) so clusters are small and local.
    h = F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100))
    src = (F.col("id") - F.pmod(F.col("id"), F.lit(25))).alias("src")
    srcs = base.select(F.col("id").alias("src"), F.col("s0").alias("src_s"))
    out = (
        base.select("id", "s0", h.alias("__h"), src)
        .join(F.broadcast(srcs) if n <= 1_000_000 else srcs, "src")
        .select(
            "id",
            F.when(F.col("__h") < 4, F.col("src_s"))
            .when(
                F.col("__h") < 12,
                F.concat(
                    F.substring("src_s", 1, 5),
                    F.lit("z"),
                    F.substring("src_s", 7, 7),
                ),
            )
            .otherwise(F.col("s0"))
            .alias("s"),
        )
        .repartition(32)
    )
    return out


def adversarial_corpus(spark, n: int):
    """Constant-prefix zero-padded names: the first PassJoin segment is
    shared corpus-wide, so its bucket is the whole length band."""
    return spark.range(n).select(
        "id",
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s"),
    ).repartition(32)


def probe(label: str, df, k: int = 1) -> None:
    df = df.localCheckpoint(eager=True)
    n = df.count()
    n_cand = {}
    t_cand = timed(
        f"{label} @ {n} strings: candidates",
        lambda: n_cand.setdefault("v", levenshtein_candidates(df, "id", "s", k).count()),
    )
    n_pairs = {}
    t_full = timed(
        f"{label} @ {n} strings: full join",
        lambda: n_pairs.setdefault("v", levenshtein_self_join(df, "id", "s", k).count()),
    )
    cand, pairs = n_cand["v"], n_pairs["v"]
    print(
        f"  -> {cand} candidates ({cand / max(n, 1):.2f}/doc), "
        f"{pairs} true pairs, {cand / max(t_full, 1e-9) / 1000:.0f}k cand/s end-to-end"
    )
    df.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run the 100x selective tier")
    args = ap.parse_args()
    spark = get_spark("bench-r6-editdist")

    tiers = [20_000, 200_000] + ([2_000_000] if args.full else [])
    for n in tiers:
        probe("selective", selective_corpus(spark, n))

    # adversarial: quadratic-in-band BY DESIGN — candidates ~ n²/2
    # (every string shares the constant prefix segment and the length
    # band), so tiers stay small: 2k -> 6k should show ~9x candidates
    # for 3x docs. A first attempt at 20k/60k tiers generated 200M/1.8B
    # candidate rows and filled the box's shuffle-spill disk — that IS
    # the saturation cliff the operator docstring warns about.
    for n in (2_000, 6_000):
        probe("adversarial", adversarial_corpus(spark, n))


if __name__ == "__main__":
    main()
