"""Grouped exact quantiles via bucketed two-pass selection (A12 scale path).

The naive grouped quantile — ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY
v)`` over raw rows — is a single-task sort per group whenever the group
key has FIXED cardinality (event_type has ~5 values at every SF): at 100×
the data each task sorts 100× the rows (the r7 100M probe measured the
MAD query superlinear, 11.2× for a 10× hop). This operator generalizes
the global ``percentiles`` restructure (benchqueries/core.py) to
PARTITION BY semantics so no rank window ever touches raw-row-scale
input:

  pass 1   one map-combinable agg: per-group (min, max, count), then
           per-(group, bucket) equal-width bin counts — the only full
           scans, both combine map-side before the shuffle;
  offsets  cumulative bin offsets per group: a groups×n_bins frame,
           broadcast-sized for any fixed-cardinality key;
  select   the ≤ 2·|ps| target ranks per group locate their buckets in
           the offset frame (tiny theta join);
  pass 2   rank ONLY the rows of rank-holding (group, bucket) cells —
           the row_number window partitions by (group, bucket), so each
           task sorts ~n_g/n_bins rows, and only for selected buckets.

Interpolation arithmetic is kept textually parallel to the shared oracle
SQL (r = 1.0 + (n-1)·p; q = lo_v + (hi_v - lo_v)·(r - lo), all doubles)
so results are bit-identical to a DuckDB window-based replay — see
functions/compat.py for the cross-engine discipline.

Reference parity: exercises the percentile surface of
ex04/src/error_analysis.py:183-187 (percentile_approx) in exact,
grouped form.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def grouped_quantile_select(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    ps: Sequence[float],
    n_bins: int = 64,
    broadcast_side_frames: bool = True,
) -> DataFrame:
    """Exact interpolated quantiles per group, bucketed two-pass selection.

    Returns one row per (group, p) with columns::

        *group_cols, p, n, qvalue

    where ``qvalue`` is the rank-interpolated quantile (the value a
    ``PERCENTILE_CONT``-style window computes), ``n`` the group row
    count. NULL values must be filtered by the caller — and so must NaN:
    ``width_bucket`` returns NULL for NaN input, so NaN rows would
    silently drop from the bin counts and shift every global rank
    relative to an ORDER BY (which sorts NaN last). Callers over
    double-typed columns (events.value) own the isNotNull + NOT isnan
    precondition. Groups sort only
    (group, bucket) cells that hold a target rank; nothing ever sorts a
    whole group in one task.

    ``broadcast_side_frames`` hints broadcast on the groups×n_bins side
    frames (offsets / target bins / hits) — correct whenever group
    cardinality is driver-broadcastable (fixed-cardinality keys, the
    motivating case). With millions of groups pass False: every side
    join is a plain equi-join on the group key and shuffles fine.
    """
    gcols = list(group_cols)
    spark = df.sparkSession
    hint = F.broadcast if broadcast_side_frames else (lambda d: d)

    ev = df.select(*gcols, F.col(value_col).alias("v"))

    # pass 1: per-group bounds + count — one map-combinable agg. Lazy
    # checkpoints below cut the CTE-inline recompute fan-out (mm feeds
    # the binning, the rank grid and the offset frame; offsets feeds the
    # bucket lookup and the global-rank join) — without the cuts each
    # reference re-scans the input through the whole subtree (CLAUDE.md).
    mm = (
        ev.groupBy(*gcols)
        .agg(
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.count("*").alias("n"),
        )
        .localCheckpoint(eager=False)
    )
    binned = ev.join(hint(mm), gcols).select(
        *gcols,
        "v",
        F.when(F.col("mx") == F.col("mn"), F.lit(1))
        .otherwise(
            F.least(
                F.lit(n_bins),
                F.width_bucket("v", F.col("mn"), F.col("mx"), F.lit(n_bins)),
            )
        )
        .alias("bkt"),
    )
    counts = binned.groupBy(*gcols, "bkt").agg(F.count("*").alias("c"))
    # cumulative offsets over ≤ n_bins aggregated bins PER GROUP — the
    # window rides the groups×n_bins frame, never raw rows
    off_w = (
        Window.partitionBy(*gcols)
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *gcols, "bkt", "c",
        F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off"),
    ).localCheckpoint(eager=False)

    # target ranks per (group, p): r = 1 + (n-1)p, anchors floor/ceil —
    # arithmetic textually parallel to the oracle SQL so doubles match
    ps_df = spark.createDataFrame([(float(p),) for p in ps], "p double")
    k = mm.select(*gcols, "n").crossJoin(F.broadcast(ps_df)).select(
        *gcols, "n", "p",
        (F.lit(1.0) + (F.col("n") - 1) * F.col("p")).alias("r"),
        F.floor(F.lit(1.0) + (F.col("n") - 1) * F.col("p")).alias("lo"),
        F.ceil(F.lit(1.0) + (F.col("n") - 1) * F.col("p")).alias("hi"),
    )
    target_ranks = (
        k.select(*gcols, F.explode(F.array("lo", "hi")).alias("rk")).distinct()
    )
    # which (group, bucket) cells hold those ranks: |groups|·2|ps| ranks
    # against the groups×n_bins offset frame — both sides tiny
    tr = target_ranks.alias("tr")
    offs = offsets.alias("offs")
    cell_cond = [F.col(f"tr.{g}") == F.col(f"offs.{g}") for g in gcols] + [
        F.col("tr.rk") > F.col("offs.off"),
        F.col("tr.rk") <= F.col("offs.off") + F.col("offs.c"),
    ]
    target_bins = (
        tr.join(hint(offs), cell_cond)
        .select(*[F.col(f"offs.{g}") for g in gcols], F.col("offs.bkt"))
        .distinct()
    )
    # pass 2 (selective): rank ONLY rank-holding cells; each window task
    # sorts one (group, bucket) cell — ~n_g/n_bins rows
    cand = binned.join(hint(target_bins), [*gcols, "bkt"])
    ranked = (
        cand.withColumn(
            "lrn",
            F.row_number().over(
                Window.partitionBy(*gcols, "bkt").orderBy("v")
            ),
        )
        .join(hint(offsets.select(*gcols, "bkt", "off")), [*gcols, "bkt"])
        .select(*gcols, "v", (F.col("off") + F.col("lrn")).alias("grn"))
    )
    rnk = ranked.alias("rnk")
    tr2 = target_ranks.alias("tr2")
    hits = (
        rnk.join(
            hint(tr2),
            [F.col(f"rnk.{g}") == F.col(f"tr2.{g}") for g in gcols]
            + [F.col("rnk.grn") == F.col("tr2.rk")],
        )
        .select(*[F.col(f"rnk.{g}") for g in gcols], F.col("tr2.rk"), F.col("rnk.v"))
        .localCheckpoint(eager=False)
    )
    kk, lov, hiv = k.alias("kk"), hits.alias("lov"), hits.alias("hiv")
    lo_cond = [F.col(f"kk.{g}") == F.col(f"lov.{g}") for g in gcols] + [
        F.col("kk.lo") == F.col("lov.rk")
    ]
    hi_cond = [F.col(f"kk.{g}") == F.col(f"hiv.{g}") for g in gcols] + [
        F.col("kk.hi") == F.col("hiv.rk")
    ]
    return (
        kk.join(hint(lov), lo_cond)
        .join(hint(hiv), hi_cond)
        .select(
            *[F.col(f"kk.{g}") for g in gcols],
            F.col("kk.p").alias("p"),
            F.col("kk.n").alias("n"),
            (
                F.col("lov.v")
                + (F.col("hiv.v") - F.col("lov.v"))
                * (F.col("kk.r") - F.col("kk.lo"))
            )
            .cast("double")
            .alias("qvalue"),
        )
    )
