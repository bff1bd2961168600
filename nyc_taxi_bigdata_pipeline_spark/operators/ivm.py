"""Incremental view maintenance: keep materialized join- and
aggregate-views current from insert-only base deltas, without ever
re-reading the full base tables.

This generalizes ``maintenance.update_daily_rollup`` (which exploits the
month-partition alignment of the taxi pipeline) to views whose groups
ARE NOT aligned with the arriving batch — the classic ΔV algebra:

    join view  V = A ⋈ B:   ΔV = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    agg view   V = γ(T):    V' = merge(V, γ(ΔT))   for SUM/COUNT
                            (MIN/MAX merge with GREATEST/LEAST — still
                            insert-only; deletions would need 2-sided
                            deltas or recompute, intentionally out of
                            scope here)

At 100 TB the point is cost shape: each maintenance step touches
O(|Δ| · join fan-out) rows, never O(|A|+|B|). ΔA⋈B shuffles only the
delta (broadcast when small) against a pruned/bucketed read of B; the
agg merge is a key-equi full-outer join of two group-level tables, both
≪ the fact table.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def join_view_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """Rows ADDED to the inner-join view A⋈B by insert-only base deltas.

    The three terms are disjoint by construction (old⋈old is already in
    the view; each term pairs at least one delta row), so a plain union
    is exact — append the result to the materialized view.
    """
    on = [on] if isinstance(on, str) else list(on)
    return (
        delta_a.join(b_old, on)
        .unionByName(a_old.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def agg_view_merge(
    view_old: DataFrame,
    delta_rows: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str | None = "cnt",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """New state of a grouped SUM/COUNT/MIN/MAX view after an insert-only
    delta batch: aggregate ONLY the delta, then key-merge group totals
    with the old view (new groups appear via the full-outer null side).
    """
    keys = list(keys)
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.min(c).alias(c) for c in min_cols]
    aggs += [F.max(c).alias(c) for c in max_cols]
    if count_col:
        aggs.append(F.count("*").cast("bigint").alias(count_col))
    d = delta_rows.groupBy(*keys).agg(*aggs)

    o, n = view_old.alias("o"), d.alias("n")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else (cond & c)
    merged = o.join(n, cond, "full_outer")

    out = [F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys]
    for c in sum_cols:
        out.append(
            (
                F.coalesce(F.col(f"o.{c}"), F.lit(0)) + F.coalesce(F.col(f"n.{c}"), F.lit(0))
            ).alias(c)
        )
    for c in min_cols:
        out.append(F.least(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c))
    for c in max_cols:
        out.append(F.greatest(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c))
    if count_col:
        out.append(
            (
                F.coalesce(F.col(f"o.{count_col}"), F.lit(0))
                + F.coalesce(F.col(f"n.{count_col}"), F.lit(0))
            )
            .cast("bigint")
            .alias(count_col)
        )
    return merged.select(*out)
