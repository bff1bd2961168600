"""Core scan/filter/aggregate/sort queries (SURVEY §2.2, §2.4, §2.6-2.8).

Each query is the Spark-native re-expression of a reference operator,
mapped onto the driver's TPC-H-ish testdata. Reference citations sit on
each query's ``doc``; numeric aggregates use `functions.compat` fragments
so the DuckDB oracle is textually identical where it matters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import compat as C
from ..sources.tables import load_table
from .registry import register, sx

# ---------------------------------------------------------------- A1/A14: KPIs

_KPI_FRAGS = [
    C.count_star("total_rows"),
    C.sum_exact(C.money("l_quantity"), "sum_qty"),
    C.sum_exact(C.money("l_extendedprice"), "sum_price"),
    C.avg_exact(C.money("l_extendedprice"), "l_extendedprice", "avg_price"),
    C.avg_exact(C.money("l_quantity"), "l_quantity", "avg_qty"),
]


@register(
    "kpi_global",
    f"SELECT {', '.join(_KPI_FRAGS)} FROM lineitem",
    doc="A1 global scalar agg (app.py:239-252); A14 profile aggs (eda.py:41-47)",
)
def kpi_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(*[sx(f) for f in _KPI_FRAGS])


# ------------------------------------------------------- TPC-H Q1 shape (A1/A6)

_DISC = f"{C.money('l_extendedprice')} * (1 - {C.rate('l_discount')})"
_CHARGE = f"{_DISC} * (1 + {C.rate('l_tax')})"
_PRICING_FRAGS = [
    C.sum_exact(C.money("l_quantity"), "sum_qty"),
    C.sum_exact(C.money("l_extendedprice"), "sum_base_price"),
    C.sum_exact(_DISC, "sum_disc_price"),
    C.sum_exact(_CHARGE, "sum_charge"),
    C.avg_exact(C.money("l_quantity"), "l_quantity", "avg_qty"),
    C.avg_exact(C.rate("l_discount"), "l_discount", "avg_disc"),
    C.count_star("count_order"),
]


@register(
    "pricing_summary",
    f"""SELECT l_returnflag, l_linestatus, {', '.join(_PRICING_FRAGS)}
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    doc="flagship: scan+filter+group-agg spine (A1/A6 composite; P3 pushdown)",
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*[sx(f) for f in _PRICING_FRAGS])
    )


# ------------------------------------------------------------------ A2: bounds


@register(
    "minmax_bounds",
    """SELECT MIN(CAST(o_orderdate AS DATE)) AS min_date,
              MAX(CAST(o_orderdate AS DATE)) AS max_date FROM orders""",
    doc="A2 MIN/MAX date bounds for filter widget (app.py:151-156)",
)
def minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.agg(F.min(d).alias("min_date"), F.max(d).alias("max_date"))


# ------------------------------------------------------- A3/A5: date series


@register(
    "daily_series",
    """SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
       FROM orders GROUP BY CAST(o_orderdate AS DATE)""",
    doc="A3 trips-per-day time series (app.py:287-300)",
    bench=True,
)
def daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(sx(C.count_star()))


@register(
    "yearly_counts",
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, COUNT(*) AS cnt
       FROM orders GROUP BY 1""",
    doc="A5 group-by-year counts (EDA notebook cell 16)",
)
def yearly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("yr")).agg(sx(C.count_star()))


# ----------------------------------------------------------------- A4: hourly


@register(
    "hourly_series",
    """SELECT CAST(hour(ts) AS INT) AS hr, COUNT(*) AS cnt,
              CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1""",
    doc="A4 trips-per-hour (app.py:330-344) on the events table; hour() "
        "replaces the reference's dim_time join (J3 short-circuit)",
)
def hourly_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("hr"))
        .agg(sx(C.count_star()), sx(C.sum_exact(C.money("value"), "sum_value")))
    )


# ------------------------------------------------------ A6: category revenue


@register(
    "category_revenue",
    f"""SELECT o_orderpriority, COUNT(*) AS cnt,
               {C.sum_exact(C.fine('o_totalprice'), 'revenue')},
               {C.avg_exact(C.fine('o_totalprice'), 'o_totalprice', 'avg_revenue')}
        FROM orders GROUP BY o_orderpriority""",
    doc="A6 count+revenue per category (app.py:368-380, payment breakdown)",
    bench=True,
)
def category_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        sx(C.count_star()),
        sx(C.sum_exact(C.fine("o_totalprice"), "revenue")),
        sx(C.avg_exact(C.fine("o_totalprice"), "o_totalprice", "avg_revenue")),
    )


# -------------------------------------------------------------- A8: distinct


@register(
    "distinct_values",
    "SELECT DISTINCT c_mktsegment AS segment FROM customer",
    doc="A8 SELECT DISTINCT (app.py:188-207, dim seeding inputs)",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(F.col("c_mktsegment").alias("segment")).distinct()


# -------------------------------------------------- A9/A10: data profiling


_NULL_FRAGS = [C.null_count(c, f"nulls_{c}") for c in ("text", "lang", "source", "n_chars")]


@register(
    "null_profile",
    f"SELECT COUNT(*) AS total_rows, {', '.join(_NULL_FRAGS)} FROM documents",
    doc="A9 per-column null profile (EDA notebook cell 5)",
)
def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(sx(C.count_star("total_rows")), *[sx(f) for f in _NULL_FRAGS])


@register(
    "negative_profile",
    f"""SELECT 'customer' AS tbl, {C.neg_count('c_acctbal', 'neg_cnt')} FROM customer
        UNION ALL
        SELECT 'supplier' AS tbl, {C.neg_count('s_acctbal', 'neg_cnt')} FROM supplier""",
    doc="A10 negative-amount counts (EDA notebook cell 7)",
)
def negative_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cc = c.agg(sx(C.neg_count("c_acctbal", "neg_cnt"))).select(
        F.lit("customer").alias("tbl"), "neg_cnt"
    )
    ss = s.agg(sx(C.neg_count("s_acctbal", "neg_cnt"))).select(
        F.lit("supplier").alias("tbl"), "neg_cnt"
    )
    return cc.union(ss)


# ---------------------------------------------------- A11/A12: residual stats


_VALUE_STATS_FRAGS = [
    "COUNT(value) AS cnt",
    C.avg_exact(C.money("value"), "value", "mean_value"),
    C.stddev_exact("value", C.MONEY, "std_value"),
    "MIN(value) AS min_value",
    "MAX(value) AS max_value",
]


@register(
    "value_stats",
    f"SELECT {', '.join(_VALUE_STATS_FRAGS)} FROM events",
    doc="A11 count/mean/stddev/min/max error-stats agg (error_analysis.py:176-182)",
)
def value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(*[sx(f) for f in _VALUE_STATS_FRAGS])


# Interpolated percentiles computed with engine-identical arithmetic:
# rank r = 1+(n-1)p, linear interpolation between floor/ceil ranks. The
# double ops are textually identical in both dialects → identical bits.
_PCT_SQL = """
WITH o AS (
  SELECT value AS v,
         ROW_NUMBER() OVER (ORDER BY value) AS rn,
         COUNT(*) OVER () AS n
  FROM {table} WHERE value IS NOT NULL
),
p AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.25),(0.50),(0.75),(0.95),(0.99)) AS t(p)),
k AS (
  SELECT p.p AS p,
         1.0 + (m.n - 1) * p.p AS r,
         CAST(FLOOR(1.0 + (m.n - 1) * p.p) AS BIGINT) AS lo,
         CAST(CEILING(1.0 + (m.n - 1) * p.p) AS BIGINT) AS hi
  FROM p CROSS JOIN (SELECT MAX(n) AS n FROM o) m
)
SELECT k.p AS pct, CAST(lov.v + (hiv.v - lov.v) * (k.r - k.lo) AS DOUBLE) AS pct_value
FROM k JOIN o lov ON lov.rn = k.lo JOIN o hiv ON hiv.rn = k.hi
"""


@register(
    "percentiles",
    _PCT_SQL.format(table="events"),
    doc="A12 percentile_approx parity (error_analysis.py:183-187) via exact "
        "rank-interpolation so Spark and the oracle agree bit-for-bit. "
        "Spark side is the SCALE shape (r6 verdict finding 2): bucketed "
        "two-pass selection — equal-width bin counts locate the ≤10 target "
        "ranks, and only the rows of the ≤10 rank-holding buckets are "
        "sorted (per-bucket windows) — no unpartitioned window ever touches "
        "raw rows; the oracle keeps the one-shot global-window SQL",
)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    n_bins = 64
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
    )
    # pass 1: one map-combined agg for bounds + count (the only full pass
    # that shuffles — 64 groups after the bin counts below)
    # lazy checkpoints cut the CTE-inline recompute fan-out (CLAUDE.md):
    # mm feeds binned + the rank frame, offsets feeds the bin lookup +
    # the global-rank join, hits is referenced twice (lo/hi) — without
    # the cuts each reference re-scans events through the whole subtree
    mm = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count("*").alias("n"),
    ).localCheckpoint(eager=False)
    binned = ev.crossJoin(F.broadcast(mm)).select(
        "value",
        F.when(F.col("mx") == F.col("mn"), F.lit(1))
        .otherwise(
            F.least(
                F.lit(n_bins),
                F.width_bucket("value", F.col("mn"), F.col("mx"), F.lit(n_bins)),
            )
        )
        .alias("bkt"),
    )
    counts = binned.groupBy("bkt").agg(F.count("*").alias("c"))
    # cumulative offsets over ≤64 aggregated bins — the one unpartitioned
    # window here is bounded by construction (whitelisted in
    # tests/test_plans._GLOBAL_WINDOW_OK)
    off_w = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bkt", "c", F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off")
    ).localCheckpoint(eager=False)

    # target ranks: r = 1 + (n-1)p, interpolation anchors floor/ceil —
    # arithmetic textually identical to _PCT_SQL so doubles match bitwise
    ps = spark.createDataFrame([(p,) for p in (0.25, 0.50, 0.75, 0.95, 0.99)], "p double")
    k = ps.crossJoin(F.broadcast(mm.select("n"))).select(
        "p",
        (F.lit(1.0) + (F.col("n") - 1) * F.col("p")).alias("r"),
        F.floor(F.lit(1.0) + (F.col("n") - 1) * F.col("p")).alias("lo"),
        F.ceil(F.lit(1.0) + (F.col("n") - 1) * F.col("p")).alias("hi"),
    )
    target_ranks = (
        k.select(F.explode(F.array("lo", "hi")).alias("rk")).distinct()
    )
    # which bins hold those ranks (≤10 × ≤64 theta join — both sides tiny)
    target_bins = (
        target_ranks.join(
            F.broadcast(offsets),
            (F.col("rk") > F.col("off")) & (F.col("rk") <= F.col("off") + F.col("c")),
        )
        .select("bkt")
        .distinct()
    )
    # pass 2 (selective): rank ONLY the rows of rank-holding bins —
    # per-bin windows, each bin ~n/64 rows
    cand = binned.join(F.broadcast(target_bins), "bkt")
    ranked = (
        cand.withColumn(
            "lrn", F.row_number().over(Window.partitionBy("bkt").orderBy("value"))
        )
        .join(F.broadcast(offsets.select("bkt", "off")), "bkt")
        .select("value", (F.col("off") + F.col("lrn")).alias("grn"))
    )
    hits = (
        ranked.join(F.broadcast(target_ranks), F.col("grn") == F.col("rk"))
        .select("rk", "value")
        .localCheckpoint(eager=False)
    )
    lov, hiv = hits.alias("lov"), hits.alias("hiv")
    return (
        k.join(F.broadcast(lov), F.col("lo") == F.col("lov.rk"))
        .join(F.broadcast(hiv), F.col("hi") == F.col("hiv.rk"))
        .select(
            F.col("p").alias("pct"),
            (
                F.col("lov.value")
                + (F.col("hiv.value") - F.col("lov.value")) * (F.col("r") - F.col("lo"))
            )
            .cast("double")
            .alias("pct_value"),
        )
    )


# ----------------------------------------------------------- A13: bucket agg

_BUCKET = """CASE WHEN o_totalprice < 50000 THEN 'low'
     WHEN o_totalprice < 150000 THEN 'medium'
     WHEN o_totalprice < 300000 THEN 'high'
     ELSE 'very_high' END"""


@register(
    "price_buckets",
    f"""SELECT {_BUCKET} AS price_bucket, COUNT(*) AS cnt,
               {C.avg_exact(C.fine('o_totalprice'), 'o_totalprice', 'avg_price')},
               MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        FROM orders GROUP BY 1""",
    doc="A13 CASE-bucketed group agg (error_analysis.py:229-243)",
)
def price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("price_bucket", F.expr(_BUCKET))
        .groupBy("price_bucket")
        .agg(
            sx(C.count_star()),
            sx(C.avg_exact(C.fine("o_totalprice"), "o_totalprice", "avg_price")),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# ------------------------------------------------- P9/P10: BETWEEN + IN-list


@register(
    "between_in_filter",
    f"""SELECT COUNT(*) AS cnt, {C.sum_exact(C.fine('o_totalprice'), 'revenue')}
        FROM orders
        WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')""",
    doc="P9 BETWEEN + P10 IN-list predicates (app.py:248-251)",
)
def between_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.to_date("o_orderdate").between("1996-01-01", "1996-12-31"))
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .agg(sx(C.count_star()), sx(C.sum_exact(C.fine("o_totalprice"), "revenue")))
    )


# --------------------------------------- P4-P7: null-rejection / domain clean


@register(
    "clean_filter_count",
    """SELECT COUNT(*) AS cnt FROM lineitem
       WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
         AND l_shipdate IS NOT NULL AND l_quantity >= 0
         AND l_extendedprice >= 0 AND (l_discount IS NULL OR l_discount >= 0)""",
    doc="P4 null-rejection + P5 non-negative domain + P6 quality filter "
        "(Ex02DataIngestion.scala:76-87, features.py:37-47)",
)
def clean_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cleaned = li.filter(
        F.col("l_orderkey").isNotNull()
        & F.col("l_partkey").isNotNull()
        & F.col("l_shipdate").isNotNull()
        & (F.col("l_quantity") >= 0)
        & (F.col("l_extendedprice") >= 0)
        & (F.col("l_discount").isNull() | (F.col("l_discount") >= 0))
    )
    return cleaned.agg(sx(C.count_star()))


# ------------------------------------------------- P1: cast-normalization

_CAST_FRAGS = [
    C.count_star("cnt"),
    C.sum_int("CAST(FLOOR(l_quantity) AS INT)", "qty_floor_sum"),
    C.sum_int("CAST(l_linenumber AS BIGINT)", "linenumber_sum"),
    "COUNT(DISTINCT CAST(l_returnflag AS STRING)) AS flag_card",
]


@register(
    "cast_normalize",
    f"SELECT {', '.join(_CAST_FRAGS)} FROM lineitem",
    doc="P1 cast-normalize projection checksum (Ex02DataIngestion.scala:50-68); "
        "FLOOR before int cast because bare double→int casts diverge across engines",
)
def cast_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(*[sx(f) for f in _CAST_FRAGS])


# -------------------------------------------- §2.7 set op: union + distinct


@register(
    "union_distinct_keys",
    """SELECT DISTINCT k FROM (
         SELECT l_partkey AS k FROM lineitem
         UNION ALL
         SELECT p_partkey AS k FROM part) u""",
    doc="§2.7 union-distinct dim seeding (dw_load_incremental.sql:22-32: "
        "PU∪DO location ids)",
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.select(F.col("l_partkey").alias("k"))
        .union(p.select(F.col("p_partkey").alias("k")))
        .distinct()
    )


# --------------------------------------- §2.8 DOW parity + scalar functions


@register(
    "dow_profile",
    """SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow, COUNT(*) AS cnt
       FROM orders GROUP BY 1""",
    doc="§2.8 EXTRACT(DOW) Postgres parity: Spark dayofweek()-1 == DuckDB/PG "
        "0=Sunday convention (dw_load_incremental.sql:34-42)",
)
def dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy((F.dayofweek(F.to_date("o_orderdate")) - 1).alias("dow")).agg(
        sx(C.count_star())
    )


# ---------------------------------------------- §2.9 tumbling-window (batch)


@register(
    "tumbling_hourly",
    f"""SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS INT) AS hr, event_type,
               COUNT(*) AS cnt, {C.sum_exact(C.money('value'), 'sum_value')}
        FROM events GROUP BY 1, 2, 3""",
    doc="§2.9 tumbling-window agg, batch semantics of streaming.events "
        "(1h windows over event time)",
    bench=True,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hr"),
            "event_type",
        ).agg(sx(C.count_star()), sx(C.sum_exact(C.money("value"), "sum_value")))
    )


# ----------------------------------------------- P11/O4: scatter sample


@register(
    "scatter_sample",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_quantity > 0 AND l_quantity <= 30
         AND l_extendedprice > 0 AND l_extendedprice <= 20000
       ORDER BY l_orderkey, l_linenumber LIMIT 5000""",
    doc="P11 scatter-domain filter + O4 LIMIT-as-sampler (EDA notebook "
        "cell 30: distance-vs-amount scatter); ORDER BY the natural key "
        "makes the sampled page deterministic, unlike the reference's "
        "bare LIMIT",
)
def scatter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 0)
            & (F.col("l_quantity") <= 30)
            & (F.col("l_extendedprice") > 0)
            & (F.col("l_extendedprice") <= 20000)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(5000)
    )


# ------------------------------------------------------- O2/O3: top-N by |dev|


@register(
    "topn_abs_dev",
    """SELECT event_id, value, ABS(value - 100.0) AS abs_dev FROM events
       ORDER BY ABS(value - 100.0) DESC, event_id LIMIT 20""",
    doc="O3 top-N rows by abs error (error_analysis.py:294-308); deterministic "
        "tiebreak on event_id",
)
def topn_abs_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "value", F.abs(F.col("value") - 100.0).alias("abs_dev"))
        .orderBy(F.desc("abs_dev"), F.asc("event_id"))
        .limit(20)
    )


# ------------------------------ ex01→ex03 end-to-end domain pipeline (P/J/A/Q)


def _taxi_pipeline_oracle(year: int = 2023, month: int = 1, n: int = 5000) -> str:
    """DuckDB twin of the full domain chain: regenerate the portable
    trips (sources/synthetic.portable_trips_duckdb_sql — row parity
    pinned in tests/test_synthetic_portable.py), apply the ex02
    cleaning predicates, and roll up revenue per pickup day.

    The Spark side additionally plants EXACT duplicate rows
    (rid % 97 == 0) and removes them with the natural-key idempotent
    load; the oracle neither plants nor dedups because (a) a planted
    duplicate is bit-identical to its original in every aggregated
    column, so whichever copy ``dropDuplicates`` keeps the rollup is
    unchanged, and (b) the non-planted rows have ZERO natural-key
    collisions at this (seed, n) — pinned by
    tests/test_synthetic_portable.py::test_portable_fact_keys_collision_free
    — so the dedup removes exactly the planted copies and nothing else.
    """
    from ..functions.datetime_parity import month_window
    from ..sources.synthetic import _month_span_seconds, portable_trips_duckdb_sql

    start, _end = month_window(year, month)
    span = _month_span_seconds(year, month)
    gen = portable_trips_duckdb_sql(year, month, n)
    return f"""
    WITH gen AS ({gen}),
    clean AS (
      SELECT * FROM gen
      WHERE pickup_s IS NOT NULL AND dropoff_s IS NOT NULL
        AND pu_id IS NOT NULL AND do_id IS NOT NULL
        AND dist_c >= 0 AND total_c >= 0
        AND (passenger_count IS NULL OR passenger_count >= 0)
        AND pickup_s >= 0 AND pickup_s < {span}
    )
    SELECT DATE '{start}' + CAST(pickup_s // 86400 AS INT) AS pickup_date,
           CAST(COUNT(*) AS BIGINT) AS trips,
           CAST(SUM(total_c) AS DOUBLE) / 100 AS revenue
    FROM clean GROUP BY pickup_date ORDER BY pickup_date"""


@register(
    "taxi_domain_pipeline",
    _taxi_pipeline_oracle(),
    doc="ex01→ex03 parity, END-TO-END: deterministic distributed trip "
        "generator (portable md5→int64 hashing, integer-cents money) → "
        "cast-normalize + month-window + quality filters (ingest.clean_month) "
        "→ star fact build with planted-duplicate natural-key dedup "
        "(warehouse.load_fact_idempotent) → daily revenue rollup. "
        "Self-contained (synthesizes its input); converted from rows-only "
        "in r7 via the portable generator (VERDICT r6 task 2)",
)
def taxi_domain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import ingest, warehouse
    from ..session import ensure_engine_confs
    from ..sources.synthetic import make_trips_month_portable

    # no load_table call in this query (it synthesizes its input), so set
    # the UTC/date-math confs explicitly — the driver hands us its own
    # session (CLAUDE.md contract)
    ensure_engine_confs(spark)
    raw = make_trips_month_portable(spark, 2023, 1, 5000)
    # plant exact duplicates so the natural-key dedup demonstrably bites;
    # they vanish in the idempotent load (see _taxi_pipeline_oracle)
    planted = raw.unionByName(raw.filter(F.col("rid") % 97 == 0))
    clean = ingest.clean_month(planted, 2023, 1)
    fact = warehouse.load_fact_idempotent(warehouse.build_fact(clean), None)
    return (
        fact.groupBy("pickup_date")
        .agg(
            F.count("*").alias("trips"),
            F.sum(F.col("total_amount").cast("decimal(12,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("pickup_date")
    )
