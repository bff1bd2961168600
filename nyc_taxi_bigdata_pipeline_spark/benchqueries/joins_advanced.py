"""As-of join, binned range join and JSON extraction — oracle-checked.

The as-of oracle uses the same union+window formulation in both engines
(it is plain ANSI window SQL); the range-join oracle is the naive theta
join (DuckDB's optimizer handles it at test SF), while the Spark side
runs the binned equi-join — same results, scale-appropriate plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import compat as C
from ..sources.tables import load_table
from . import dialect as D
from .registry import register

# --------------------------------------------------------------- as-of join

_ASOF_SQL = """
WITH u AS (
  SELECT user_id, event_id, {epoch} AS t, 1 AS side, value
  FROM {table} WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, event_id, {epoch} AS t, 0 AS side, value
  FROM {table} WHERE event_type = 'view'
),
filled AS (
  SELECT user_id, event_id, t, side, value,
         MAX(CASE WHEN side = 0 THEN t END) OVER (
           PARTITION BY user_id ORDER BY t, side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_t
  FROM u
)
SELECT user_id, event_id AS purchase_id, t AS purchase_t, last_view_t,
       CASE WHEN last_view_t IS NULL THEN NULL ELSE t - last_view_t END AS us_since_view
FROM filled WHERE side = 1"""


@register(
    "asof_purchase_view",
    _ASOF_SQL.format(table="events", epoch="epoch_us(ts)"),
    doc="custom operator: as-of join (each purchase ↔ latest prior view of "
        "the same user) via the scalable union+keyed-window formulation "
        "(operators/asof.py); epoch-µs keys for ns/µs timestamp parity",
    bench=True,
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("bq_asof_events")
    return spark.sql(_ASOF_SQL.format(table="bq_asof_events", epoch="unix_micros(ts)"))


# ---------------------------------------------------------- binned range join

_TIERS = [
    ("bronze", 0.0, 50.0),
    ("silver", 50.0, 150.0),
    ("gold", 150.0, 300.0),
    ("platinum", 300.0, 1000.0),
]

_RANGE_ORACLE = f"""
WITH tiers(tier, lo, hi) AS (
  VALUES {', '.join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)}
)
SELECT tier, COUNT(*) AS cnt,
       {C.sum_exact(C.money('value'), 'sum_value')}
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY tier"""


@register(
    "range_join_tiers",
    _RANGE_ORACLE,
    doc="custom operator: range join as binned equi-join + residual filter "
        "(operators/asof.range_join_binned) — O(n·m) theta join → "
        "shuffle-bounded equi-join; oracle is the naive theta join",
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    tiers = ev.sparkSession.createDataFrame(_TIERS, "tier string, lo double, hi double")
    joined = range_join_binned(ev, F.broadcast(tiers), "value", "lo", "hi", bin_width=50.0)
    return joined.groupBy("tier").agg(
        F.expr("COUNT(*)").alias("cnt"),
        F.expr(f"CAST(SUM({C.money('value')}) AS DOUBLE)").alias("sum_value"),
    )


# -------------------------------------------------------------- JSON extract


def _json_k(engine: str, table: str) -> str:
    if engine == D.DUCK:
        k = "CAST(json_extract(props, '$.k') AS INT)"
    else:
        k = "CAST(get_json_object(props, '$.k') AS INT)"
    return f"""
    SELECT CAST({k} % 10 AS INT) AS k_mod, COUNT(*) AS cnt,
           CAST(SUM({k}) AS BIGINT) AS k_sum
    FROM {table} WHERE props IS NOT NULL GROUP BY 1"""


@register(
    "json_extract_props",
    _json_k(D.DUCK, "events"),
    doc="§2.8 extension: JSON field extraction from the events.props "
        "payload column (the reference only does driver-side JSON I/O)",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("bq_json_events")
    return spark.sql(_json_k(D.SPARK, "bq_json_events"))


# ------------------------------------------------------------- SCD2

# Scenario (deterministic from testdata): seed the customer dim as an
# SCD2 table open since 1990-01-01; one update batch re-segments every
# customer who ordered in 1996 (segment + '_96') effective at their
# first 1996 order date. The oracle states the same result set-wise:
# closed old rows + new open rows + untouched rows.
_SCD2_ORACLE = """
WITH upd AS (
  SELECT o_custkey AS c_custkey, MIN(CAST(o_orderdate AS DATE)) AS eff
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
),
cur AS (SELECT c_custkey, c_mktsegment FROM customer)
SELECT cur.c_custkey, cur.c_mktsegment AS segment,
       CAST('1990-01-01' AS DATE) AS valid_from,
       CASE WHEN upd.eff IS NULL THEN CAST('9999-12-31' AS DATE) ELSE upd.eff END AS valid_to,
       upd.eff IS NULL AS is_current
FROM cur LEFT JOIN upd ON cur.c_custkey = upd.c_custkey
UNION ALL
SELECT upd.c_custkey, concat(cur.c_mktsegment, '_96') AS segment,
       upd.eff AS valid_from,
       CAST('9999-12-31' AS DATE) AS valid_to,
       TRUE AS is_current
FROM upd JOIN cur ON cur.c_custkey = upd.c_custkey"""


@register(
    "scd2_customer_segments",
    _SCD2_ORACLE,
    doc="warehouse extension: SCD Type-2 dim merge (operators/scd.py) — "
        "validity intervals + current flags after one update batch; beyond "
        "the reference's insert-if-absent (dw_load_incremental.sql:54-94). "
        "One key join + key-window, no MERGE statement",
    bench=True,
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_apply, scd2_init

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    scd = scd2_init(
        c.select("c_custkey", F.col("c_mktsegment").alias("segment")),
        "c_custkey",
        ["segment"],
        "1990-01-01",
    )
    updates = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.min(F.col("o_orderdate").cast("date")).alias("eff_date"))
        .join(
            c.select("c_custkey", F.concat("c_mktsegment", F.lit("_96")).alias("segment")),
            "c_custkey",
        )
    )
    return scd2_apply(scd, updates, "c_custkey", ["segment"])


# --------------------------------------------- CDC latest-wins snapshot merge

# Change feed synthesized from orders: each order is one change event for
# its customer (seq = orderkey, every-23rd a delete, every-101st targets
# a brand-new key so the FULL OUTER insert path is exercised too).
_CDC_ORACLE = """
WITH changes AS (
  SELECT o_custkey + CASE WHEN o_orderkey % 101 = 0 THEN 1000000 ELSE 0 END AS k,
         o_orderkey AS seq,
         CASE WHEN o_orderkey % 23 = 0 THEN 'D' ELSE 'U' END AS op,
         o_totalprice AS bal
  FROM orders),
latest AS (
  SELECT k,
         (max({'s': seq, 'op': op, 'bal': bal})).s   AS seq,
         (max({'s': seq, 'op': op, 'bal': bal})).op  AS op,
         (max({'s': seq, 'op': op, 'bal': bal})).bal AS bal
  FROM changes GROUP BY k)
SELECT COALESCE(c.c_custkey, l.k) AS c_custkey,
       c.c_mktsegment AS c_mktsegment,
       CASE WHEN l.k IS NOT NULL THEN l.bal ELSE c.c_acctbal END AS c_acctbal,
       CAST(COALESCE(l.seq, 0) AS BIGINT) AS last_seq
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.k
WHERE l.op IS NULL OR l.op <> 'D'"""


@register(
    "cdc_merge_snapshot",
    _CDC_ORACLE,
    doc="warehouse extension: latest-wins CDC snapshot merge (operators/"
        "upsert.apply_cdc) — I/U/D change feed folded to one winner per key "
        "via struct-MAX hash aggregate (no window sort), then ONE full-outer "
        "key join applies upserts/deletes/inserts; the MERGE-with-deletes "
        "counterpart of the reference's insert-only ON CONFLICT DO NOTHING",
    bench=True,
)
def cdc_merge_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import apply_cdc

    o = load_table(spark, sf_dir, "orders")
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    changes = o.select(
        (
            F.col("o_custkey")
            + F.when(F.col("o_orderkey") % 101 == 0, F.lit(1000000)).otherwise(F.lit(0))
        ).alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 23 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("o_totalprice").alias("c_acctbal"),
    )
    return apply_cdc(base, changes, "c_custkey", "seq", "op")
