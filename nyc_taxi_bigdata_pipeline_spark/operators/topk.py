"""Top-k operators (O1-O3).

Global top-k uses orderBy+limit, which Catalyst plans as
TakeOrderedAndProject — per-partition partial top-k, no full sort, no
full shuffle. Grouped top-k is a window row_number with a rank filter;
Spark 3.4+ pushes the rank limit into the shuffle via
WindowGroupLimit, keeping per-group state bounded.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (TakeOrderedAndProject). Always pass a total order
    (add key tiebreaks) for deterministic results."""
    return df.orderBy(*order).limit(k)


def grouped_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
