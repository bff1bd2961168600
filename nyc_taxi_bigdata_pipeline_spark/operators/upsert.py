"""Idempotent-append operators — the Spark replacement for Postgres
``ON CONFLICT DO NOTHING`` (J5/J6, ``dw_load_incremental.sql``).

Design (SURVEY §7.3): without a transactional store, idempotency =
(a) dedupe the incoming batch on its natural key, then
(b) left-anti join against the existing table on that key, then
(c) append only the survivors.

At 100 TB: the anti join shuffles both sides on the key — acceptable for
dim tables (tiny) and for fact loads scoped to one month partition
(the existing side is pruned to the same partition before the join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedupe_on_key(df: DataFrame, key: Sequence[str]) -> DataFrame:
    """Batch-internal dedup on the natural key (keeps an arbitrary row
    per key, matching ON CONFLICT's first-writer-wins semantics)."""
    return df.dropDuplicates(list(key))


def anti_dup_append(
    incoming: DataFrame,
    existing: DataFrame | None,
    key: Sequence[str],
) -> DataFrame:
    """Rows of ``incoming`` whose key is absent from ``existing`` —
    the J6 left-anti 'insert-if-absent'. ``existing=None`` → first load.

    NULL-safe key equality (``eqNullSafe``) so NULL key components
    behave like Postgres' composite unique index treats them in the
    reference data (keys are non-null post-cleaning, but be safe).
    """
    batch = dedupe_on_key(incoming, key)
    if existing is None:
        return batch
    cond = None
    for k in key:
        c = batch[k].eqNullSafe(existing[k])
        cond = c if cond is None else (cond & c)
    return batch.join(existing.select(*key), on=cond, how="left_anti")


def union_distinct_keys(frames: Sequence[DataFrame], out_col: str) -> DataFrame:
    """J5 dim seeding: distinct union of key columns from multiple
    sources (PU ∪ DO location ids, dw_load_incremental.sql:22-32).
    Each input frame must be a single-column projection."""
    it = iter(frames)
    acc = next(it).toDF(out_col)
    for f in it:
        acc = acc.union(f.toDF(out_col))
    return acc.distinct()
