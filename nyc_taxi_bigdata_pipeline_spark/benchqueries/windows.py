"""Window-function queries (SURVEY §2.5 + O1-O3).

The reference does its only "rank" client-side in pandas (app.py:421);
the Spark-native engine expresses it as window functions. Window frames
are fully ordered with key tiebreaks so results are deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import compat as C
from ..sources.tables import load_table
from .registry import register


@register(
    "window_rank_topk",
    """SELECT segment, c_custkey, c_acctbal, CAST(rn AS INT) AS rn FROM (
         SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
                ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey) AS rn
         FROM customer) t
       WHERE rn <= 3""",
    doc="§2.5 row_number rank (app.py:421 client-side rank → window); top-3 "
        "customers by balance per segment",
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    f"""SELECT o_custkey, o_orderkey,
               CAST(SUM({C.fine('o_totalprice')}) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_total
        FROM orders""",
    doc="§2.5 running aggregate per key; exact-decimal window SUM so the "
        "accumulation order can't produce float drift",
    bench=True,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.expr(C.fine("o_totalprice"))).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_lag_delta",
    """SELECT o_custkey, o_orderkey,
              CAST(o_totalprice - LAG(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS delta_prev
       FROM orders""",
    doc="§2.5 lag/lead: order-to-order price delta per customer (double "
        "subtraction of identical operands is engine-exact)",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).cast("double").alias("delta_prev"),
    )


# Grouped exact percentiles (A12 extension): same rank-interpolation as
# the global `percentiles` query, partitioned per group. Ties among equal
# values leave the value-at-rank unchanged (sorted multiset), so no
# unique tiebreak is needed for determinism.
_GROUPED_PCT_SQL = """
WITH o AS (
  SELECT event_type, value AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM {table} WHERE value IS NOT NULL
),
g AS (SELECT DISTINCT event_type, n FROM o),
p AS (SELECT CAST(p AS DOUBLE) AS p
      FROM (VALUES (0.25),(0.50),(0.75),(0.95)) AS t(p)),
k AS (
  SELECT g.event_type, p.p AS p,
         1.0 + (g.n - 1) * p.p AS r,
         CAST(FLOOR(1.0 + (g.n - 1) * p.p) AS BIGINT) AS lo,
         CAST(CEILING(1.0 + (g.n - 1) * p.p) AS BIGINT) AS hi
  FROM g CROSS JOIN p
)
SELECT k.event_type, k.p AS pct,
       CAST(lov.v + (hiv.v - lov.v) * (k.r - k.lo) AS DOUBLE) AS pct_value
FROM k
JOIN o lov ON lov.event_type = k.event_type AND lov.rn = k.lo
JOIN o hiv ON hiv.event_type = k.event_type AND hiv.rn = k.hi"""


@register(
    "grouped_percentiles",
    _GROUPED_PCT_SQL.format(table="events"),
    doc="A12 extension: per-group exact interpolated percentiles. Spark "
        "side is the SCALE shape (r7 verdict finding 1): grouped bucketed "
        "two-pass selection (operators/quantiles.py) — per-(group, bucket) "
        "bin counts locate the target ranks and only rank-holding cells "
        "are sorted, so no window ever ranks a whole fixed-cardinality "
        "group in one task; the oracle keeps the one-shot per-group rank "
        "window SQL",
)
def grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grouped_quantile_select

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    q = grouped_quantile_select(
        ev, ["event_type"], "value", [0.25, 0.50, 0.75, 0.95]
    )
    return q.select(
        "event_type", F.col("p").alias("pct"), F.col("qvalue").alias("pct_value")
    )


def _range_frame(engine: str, table: str) -> str:
    """Value-based (RANGE) window frame: per customer, revenue in the
    trailing 30-day band of each order — the frame a rows-based window
    can't express when order density varies. Day keys are exact ints and
    the windowed SUM is exact decimal, so peers-at-a-tie and accumulation
    order can't skew either engine."""
    # o_orderdate arrives as midnight TIMESTAMP in Spark's parquet read
    # and DATE in DuckDB's — normalize through an explicit DATE cast
    day = (
        "unix_date(CAST(o_orderdate AS DATE))"
        if engine != "duck"
        else "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
    )
    return f"""
    SELECT o_custkey, o_orderkey, CAST(day AS INT) AS order_day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                PARTITION BY o_custkey ORDER BY day
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS trailing_30d_revenue
    FROM (SELECT o_custkey, o_orderkey, o_totalprice, {day} AS day
          FROM {table}) t"""


@register(
    "window_range_frame",
    _range_frame("duck", "orders"),
    doc="§2.5 extension: RANGE (value-based) window frame — trailing "
        "30-day revenue per customer on integer day keys; partitioned by "
        "customer so no global sort, exact-decimal accumulation",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bq_rangef_orders")
    return spark.sql(_range_frame("spark", "bq_rangef_orders"))


# -------------------------------------- distribution windows (pct_rank/cume)


def _distribution_windows(engine: str, table: str) -> str:
    """percent_rank = (rank−1)/(rows−1) and cume_dist = rows≤x / rows —
    both exact int ratios surfaced as one double division, so they are
    bit-identical across engines. o_orderkey tiebreak keeps every rank
    deterministic; aggregated to per-priority deciles of the
    distribution functions so the result stays compact at any SF."""
    return f"""
    WITH d AS (
      SELECT o_orderpriority,
             percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS pr,
             cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice, o_orderkey) AS cd
      FROM {table}
    )
    SELECT o_orderpriority,
           CAST(FLOOR(pr * 10) AS INT) AS pr_decile,
           COUNT(*) AS cnt,
           MIN(cd) AS min_cume, MAX(cd) AS max_cume
    FROM d GROUP BY o_orderpriority, CAST(FLOOR(pr * 10) AS INT)"""


@register(
    "window_distribution",
    _distribution_windows("duck", "orders"),
    doc="§2.5 extension: distribution window functions — percent_rank + "
        "cume_dist per priority (keyed windows, no global sort), bucketed "
        "to deciles; completes the window family (rank/running/lag/range/"
        "ntile already covered)",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bq_dist_orders")
    return spark.sql(_distribution_windows("spark", "bq_dist_orders"))


# Tail-exceedance profile: the p95 threshold computed per group (same
# rank-interpolation as grouped_percentiles) joined back to tag and
# aggregate the offenders — the "p95 latency offenders" readout an SLO
# dashboard runs. Group-partitioned windows only; the (group, p95)
# threshold table is broadcast-sized at any scale; exceedance mass sums
# the exact-decimal values (compat discipline).
_P95_EXCEED_SQL = """
WITH o AS (
  SELECT event_type, value AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM {table} WHERE value IS NOT NULL
),
g AS (SELECT DISTINCT event_type, n FROM o),
k AS (
  SELECT g.event_type, g.n,
         1.0 + (g.n - 1) * CAST(0.95 AS DOUBLE) AS r,
         CAST(FLOOR(1.0 + (g.n - 1) * CAST(0.95 AS DOUBLE)) AS BIGINT) AS lo,
         CAST(CEILING(1.0 + (g.n - 1) * CAST(0.95 AS DOUBLE)) AS BIGINT) AS hi
  FROM g
),
thr AS (
  SELECT k.event_type, k.n,
         CAST(lov.v + (hiv.v - lov.v) * (k.r - k.lo) AS DOUBLE) AS p95
  FROM k
  JOIN o lov ON lov.event_type = k.event_type AND lov.rn = k.lo
  JOIN o hiv ON hiv.event_type = k.event_type AND hiv.rn = k.hi
)
{final}"""

# final aggregation over (rows o ⋈ per-group threshold t) — the SAME text
# runs in DuckDB (over the window-built thr CTE) and in Spark (over the
# operator-built threshold view), so the exceed arithmetic is shared
_P95_FINAL = """
SELECT o.event_type,
       MAX(t.n) AS n,
       MAX(t.p95) AS p95,
       CAST(SUM(CASE WHEN o.v > t.p95 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exceed,
       MAX(o.v) AS max_value,
       {exceed_mass}
FROM {o} o JOIN {thr} t ON t.event_type = o.event_type
GROUP BY o.event_type
ORDER BY o.event_type"""


def _p95_final(o: str, thr: str) -> str:
    mass = C.sum_exact(
        f"CASE WHEN o.v > t.p95 THEN {C.money('o.v')} "
        f"ELSE {C.money('0')} END",
        "exceed_mass",
    )
    return _P95_FINAL.format(o=o, thr=thr, exceed_mass=mass)


def _p95_sql(table: str) -> str:
    return _P95_EXCEED_SQL.format(table=table, final=_p95_final("o", "thr"))


@register(
    "p95_exceedances",
    _p95_sql("events"),
    doc="A12/O3 composition: per-group p95 tail-exceedance profile — "
        "the grouped rank-interpolated percentile (grouped_percentiles' "
        "idiom) joined back to count offenders and sum their exact-"
        "decimal mass (the SLO-offenders readout). Spark side computes "
        "the threshold with the SCALE shape (r7 verdict finding 1): "
        "grouped bucketed two-pass selection (operators/quantiles.py) — "
        "no rank window over raw rows; the shared final-aggregation text "
        "then runs over the broadcast-sized (group, p95) view, and the "
        "oracle replays the threshold with the one-shot rank-window SQL",
)
def p95_exceedances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantiles import grouped_quantile_select

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("bq_p95_events")
    thr = grouped_quantile_select(
        ev.filter(F.col("value").isNotNull()).select("event_type", "value"),
        ["event_type"],
        "value",
        [0.95],
    ).select("event_type", "n", F.col("qvalue").alias("p95"))
    thr.createOrReplaceTempView("bq_p95_thr")
    return spark.sql(
        _p95_final(
            "(SELECT event_type, value AS v FROM bq_p95_events "
            "WHERE value IS NOT NULL)",
            "bq_p95_thr",
        )
    )
