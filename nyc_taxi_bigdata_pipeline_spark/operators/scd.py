"""SCD Type-2 dimension merge (warehouse extension).

The reference's dim maintenance is insert-if-absent only
(``dw_load_incremental.sql:54-94`` — ON CONFLICT DO NOTHING); type-2
history (validity intervals + current flag) is the standard next step a
warehouse needs the moment a dim attribute can CHANGE. Expressed as one
keyed join + window pass — no MERGE statement, no driver loop, one
shuffle on the business key end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

OPEN_END = "9999-12-31"  # closed-world sentinel: open rows carry a far-future end


def scd2_init(dim: DataFrame, key: str, attrs: list[str], start: str) -> DataFrame:
    """Seed an SCD2 table from a current-state dim: every row open."""
    return dim.select(
        key,
        *attrs,
        F.lit(start).cast("date").alias("valid_from"),
        F.lit(OPEN_END).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    scd: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
) -> DataFrame:
    """Apply a batch of attribute updates to an SCD2 table.

    ``updates`` carries (key, attrs, eff_col); multiple versions per key
    in one batch are supported (ordered by ``eff_col``). Per key:

    - updates whose attrs equal the current row's are no-ops (dropped),
    - otherwise the current row closes at the first real change's
      effective date and each update row becomes a version whose
      ``valid_to`` is the next update's effective date (window ``lead``),
      the last one staying open.

    Idempotent: re-applying the same batch changes nothing. Shapes: one
    equi-join current⋈updates on the key plus key-partitioned windows —
    the history rows pass through untouched, so cost tracks the update
    batch and the CURRENT slice, not table history.
    """
    cur = scd.filter(F.col("is_current"))
    hist = scd.filter(~F.col("is_current"))

    cur_attrs = cur.select(
        key,
        F.col("valid_from").alias("__cur_from"),
        *[F.col(a).alias(f"__cur_{a}") for a in attrs],
    )
    w_chain = Window.partitionBy(key).orderBy(F.col(eff_col))
    upd_attrs = F.struct(*[F.col(a) for a in attrs])
    changed = (
        updates.join(cur_attrs, key, "left")
        # stale guard (idempotency): an update at/before the current
        # version's start was already absorbed by an earlier apply
        .filter(
            F.col("__cur_from").isNull()
            | (F.col(eff_col).cast("date") > F.col("__cur_from"))
        )
        # consecutive-dedup along the chain: each row must differ from
        # its predecessor (the current row's attrs for the first one)
        .withColumn(
            "__prev",
            F.lag(upd_attrs).over(w_chain),
        )
        .withColumn(
            "__basis",
            F.coalesce(
                F.col("__prev"),
                F.struct(*[F.col(f"__cur_{a}").alias(a) for a in attrs]),
            ),
        )
        .filter(~upd_attrs.eqNullSafe(F.col("__basis")))
        # referenced twice below (version chain + first-change agg) with
        # no exchange boundary at the shared frontier — without this the
        # update⋈current join and the dedup window run once PER consumer
        # (measured 25.3 → 4.5 s at 1.5M zipf updates). Lazy: the
        # materialization happens inside the caller's first action.
        .localCheckpoint(eager=False)
    )

    # version chain per key: each update row ends where the next begins
    w = Window.partitionBy(key).orderBy(F.col(eff_col))
    new_rows = (
        changed.withColumn("__next_eff", F.lead(eff_col).over(w))
        .select(
            key,
            *attrs,
            F.col(eff_col).cast("date").alias("valid_from"),
            F.coalesce(F.col("__next_eff"), F.lit(OPEN_END))
            .cast("date")
            .alias("valid_to"),
            F.col("__next_eff").isNull().alias("is_current"),
        )
    )

    first_change = changed.groupBy(key).agg(
        F.min(eff_col).cast("date").alias("__close_at")
    )
    closed = (
        # no explicit hint: the change set is usually tiny (AQE
        # broadcasts it), but a full-dim restatement must still work
        cur.join(first_change, key, "left")
        .withColumn(
            "valid_to",
            F.when(F.col("__close_at").isNotNull(), F.col("__close_at")).otherwise(
                F.col("valid_to")
            ),
        )
        .withColumn("is_current", F.col("__close_at").isNull())
        .drop("__close_at")
    )

    return hist.unionByName(closed).unionByName(new_rows)
