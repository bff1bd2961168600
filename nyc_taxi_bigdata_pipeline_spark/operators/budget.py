"""Token-budget prefix selection (weighted quantile threshold).

THE curation primitive at 100 TB: "keep the best docs until the token
budget is spent". Formally — order docs by (score DESC, id ASC) and
keep the MAXIMAL PREFIX whose cumulative token weight stays ≤ budget
(the first overflowing doc and everything after it are dropped, even
if a later smaller doc would still fit: prefix semantics keep the
selection reproducible and monotone in the budget).

The naive shape is a global cumulative window over every doc — an
Exchange SinglePartition + one-task sort of the corpus (the exact
cliff the grouped-quantile operator exists to avoid). This operator
finds the SAME boundary with bounded work:

  1. Phase A refines over the integer score: one map-combinable pass
     bins the live region into ``n_bins`` integer buckets carrying
     (count, Σweight, content min/max); the driver walks buckets from
     the top score down, fully keeping buckets whose mass fits and
     recursing into the single bucket where the budget crosses.
     Content min/max (not arithmetic bucket edges) bound the next
     level, so a heavy-tail score can't stall convergence — the same
     fix operators/quantiles.py carries (the r9 equal-width collapse).
  2. An all-ties boundary bucket (min == max score) switches to
     Phase B: identical refinement over doc_id ASCENDING within the
     tied score (ids are unique, so this always converges).
  3. A boundary bucket at or under ``leaf_rows`` rows is collected,
     sorted driver-side, and finished exactly.

Driver state is O(n_bins) per level plus one ≤``leaf_rows`` leaf; each
level is ONE map-combinable aggregate over the (geometrically
shrinking, predicate-pushed) live subset. Levels needed: uniform
scores 1-2; adversarial ties / heavy tails 2-4 plus the Phase B
levels. All arithmetic is exact integers (scores and weights are
BIGINTs), so the boundary — and therefore the kept SET — is
bit-reproducible and a DuckDB cumulative-window oracle can replay it
declaratively at test SFs.

The returned boundary defines the kept set as the single codegen
predicate ``score > s_star OR (score = s_star AND id <= d_star)``
(or none/all at the budget edges) — downstream aggregation is one
more scan, no shuffle beyond its own groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class BudgetBoundary:
    budget: int
    total_docs: int
    total_weight: int
    kept_docs: int
    kept_weight: int
    # kept set: score > s_star OR (score == s_star AND id <= d_star);
    # s_star None → nothing kept; d_star None → only score > s_star kept
    s_star: int | None
    d_star: int | None

    def kept_predicate(self, score_col: str, id_col: str) -> Column:
        if self.s_star is None:
            return F.lit(False)
        above = F.col(score_col) > F.lit(self.s_star)
        if self.d_star is None:
            return above
        return above | (
            (F.col(score_col) == F.lit(self.s_star))
            & (F.col(id_col) <= F.lit(self.d_star))
        )


def _bin_stats(live: DataFrame, col: str, lo: int, hi: int, n_bins: int):
    """One map-combinable pass: integer-exact disjoint bucketing of
    ``col`` over [lo, hi] (width = ceil(range / n_bins) so every value
    lands in exactly one bucket), per-bucket count / Σweight / content
    min-max of ``col``."""
    span = hi - lo + 1
    width = -((-span) // n_bins)  # ceil — last bucket may be short
    rows = (
        # integer DIV, never float division: ids/scores may exceed the
        # double-exact range and both operands are non-negative here
        live.groupBy(
            F.expr(f"(({col} - {lo}) DIV {width})").alias("__b")
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum("__w").cast("long").alias("wsum"),
            F.min(col).alias("mn"),
            F.max(col).alias("mx"),
        )
        .collect()
    )
    return sorted(rows, key=lambda r: r["__b"])


def token_budget_prefix(
    df: DataFrame,
    *,
    score_col: str,
    id_col: str,
    weight_col: str,
    budget: int | None = None,
    budget_fraction: tuple[int, int] | None = None,
    n_bins: int = 64,
    leaf_rows: int = 100_000,
    max_levels: int = 64,
) -> BudgetBoundary:
    """Find the (score, id) prefix boundary for ``budget`` total weight
    (or ``budget_fraction`` = (num, den) of the total — exact integer
    floor). Scores and weights must be non-negative integers."""
    base = df.select(
        F.col(score_col).cast("long").alias("__s"),
        F.col(id_col).cast("long").alias("__i"),
        F.col(weight_col).cast("long").alias("__w"),
    ).where(F.col(score_col).isNotNull() & F.col(weight_col).isNotNull())

    tot = base.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("__w"), F.lit(0)).cast("long").alias("w"),
        F.min("__s").alias("mn"),
        F.max("__s").alias("mx"),
    ).collect()[0]
    total_docs, total_weight = int(tot["n"]), int(tot["w"])
    if budget is None:
        if budget_fraction is None:
            raise ValueError("need budget or budget_fraction")
        num, den = budget_fraction
        budget = (total_weight * num) // den
    if total_docs == 0:
        return BudgetBoundary(budget, 0, 0, 0, 0, None, None)

    def finish(s_star: int | None, d_star: int | None) -> BudgetBoundary:
        if s_star is None:
            return BudgetBoundary(
                budget, total_docs, total_weight, 0, 0, None, None
            )
        bb = BudgetBoundary(
            budget, total_docs, total_weight, 0, 0, s_star, d_star
        )
        kept = (
            base.where(bb.kept_predicate("__s", "__i"))
            .agg(
                F.count("*").alias("n"),
                F.coalesce(F.sum("__w"), F.lit(0)).cast("long").alias("w"),
            )
            .collect()[0]
        )
        return BudgetBoundary(
            budget,
            total_docs,
            total_weight,
            int(kept["n"]),
            int(kept["w"]),
            s_star,
            d_star,
        )

    def max_id_at(score: int) -> int:
        r = base.where(F.col("__s") == score).agg(F.max("__i")).collect()[0]
        return int(r[0])

    if total_weight <= budget:  # whole corpus fits
        return finish(int(tot["mn"]), max_id_at(int(tot["mn"])))

    # ---- Phase A: refine over score (descending walk) ----
    lo, hi = int(tot["mn"]), int(tot["mx"])
    live = base
    rem = budget
    for _ in range(max_levels):
        if lo == hi:
            return _phase_b(base, finish, lo, rem, n_bins, leaf_rows,
                            max_levels)
        bins = _bin_stats(live, "__s", lo, hi, n_bins)
        cum = 0
        boundary = None
        for r in reversed(bins):  # top score down
            if cum + int(r["wsum"]) <= rem:
                cum += int(r["wsum"])
            else:
                boundary = r
                break
        if boundary is None:  # cannot happen: total_weight > budget
            raise AssertionError("budget walk lost the boundary")
        rem -= cum
        lo, hi = int(boundary["mn"]), int(boundary["mx"])
        live = base.where((F.col("__s") >= lo) & (F.col("__s") <= hi))
        if lo == hi:
            return _phase_b(base, finish, lo, rem, n_bins, leaf_rows,
                            max_levels)
        if int(boundary["cnt"]) <= leaf_rows:
            rows = sorted(
                live.collect(), key=lambda x: (-x["__s"], x["__i"])
            )
            return _finish_leaf(rows, rem, finish)
    raise AssertionError("score refinement did not converge")


def _finish_leaf(rows, rem: int, finish) -> BudgetBoundary:
    """Exact sequential walk of a bounded leaf, already in prefix order.
    The boundary is the last row that still fits; if none fits the
    prefix ended just above this leaf — (s of first row, d_star=None)
    keeps only strictly-higher scores."""
    cum = 0
    last = None
    for x in rows:
        if cum + int(x["__w"]) <= rem:
            cum += int(x["__w"])
            last = x
        else:
            break
    if last is None:
        return finish(int(rows[0]["__s"]), None)
    return finish(int(last["__s"]), int(last["__i"]))


def _phase_b(base, finish, s_star: int, rem: int, n_bins: int,
             leaf_rows: int, max_levels: int) -> BudgetBoundary:
    """Refine over doc_id ASC within the tied boundary score."""
    live = base.where(F.col("__s") == s_star)
    b = live.agg(
        F.min("__i").alias("mn"),
        F.max("__i").alias("mx"),
        F.count("*").alias("n"),
        F.coalesce(F.sum("__w"), F.lit(0)).cast("long").alias("w"),
    ).collect()[0]
    if int(b["w"]) <= rem:  # whole tie set fits
        return finish(s_star, int(b["mx"]))
    ilo, ihi = int(b["mn"]), int(b["mx"])
    for _ in range(max_levels):
        if int(live.where((F.col("__i") >= ilo) & (F.col("__i") <= ihi))
               .count()) <= leaf_rows:
            rows = sorted(
                live.where(
                    (F.col("__i") >= ilo) & (F.col("__i") <= ihi)
                ).collect(),
                key=lambda x: x["__i"],
            )
            cum = 0
            last = None
            for x in rows:
                if cum + int(x["__w"]) <= rem:
                    cum += int(x["__w"])
                    last = x
                else:
                    break
            if last is not None:
                return finish(s_star, int(last["__i"]))
            # nothing in this leaf fits: the prefix ended at the last id
            # of the earlier fully-fitting buckets (all of them fit —
            # that is what brought rem down to here)
            prev = live.where(F.col("__i") < ilo).agg(
                F.max("__i")
            ).collect()[0][0]
            return (
                finish(s_star, int(prev))
                if prev is not None
                else finish(s_star, None)
            )
        bins = _bin_stats(
            live.where((F.col("__i") >= ilo) & (F.col("__i") <= ihi)),
            "__i", ilo, ihi, n_bins,
        )
        cum = 0
        boundary = None
        for r in bins:  # ascending ids
            if cum + int(r["wsum"]) <= rem:
                cum += int(r["wsum"])
            else:
                boundary = r
                break
        if boundary is None:
            raise AssertionError("tie walk lost the boundary")
        rem -= cum
        ilo, ihi = int(boundary["mn"]), int(boundary["mx"])
        if ilo == ihi:  # single doc overflows on its own
            # ids are unique: the prefix ends just before this doc —
            # but ids below ilo in earlier buckets were already counted
            # into cum; the boundary doc itself does not fit
            prev = live.where(F.col("__i") < ilo).agg(
                F.max("__i")
            ).collect()[0][0]
            return finish(s_star, int(prev)) if prev is not None else finish(
                s_star, None
            )
    raise AssertionError("id refinement did not converge")
