"""Advanced operator coverage: multidimensional aggregates (ROLLUP/CUBE),
sessionization (the batch twin of streaming/events.sessionize), exact
count-distinct, closed-form ML regression, embedding near-dup pairs.

These exceed the reference surface (SURVEY §2.4 notes grouping sets are
absent there; §2.9 streaming) but are first-class for a Spark-native
analytics engine — each still carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import compat as C
from ..sources.tables import load_table
from . import dialect as D
from .registry import register

# ----------------------------------------------------- ROLLUP / CUBE

_ROLLUP_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority,
       CAST(GROUPING(year(o_orderdate)) AS INT) AS g_yr,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       COUNT(*) AS cnt, {C.sum_exact(C.fine('o_totalprice'), 'revenue')}
FROM {{table}}
GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)"""


@register(
    "rollup_revenue",
    _ROLLUP_SQL.format(table="orders"),
    doc="§2.4 extension: ROLLUP with GROUPING() indicators (absent from the "
        "reference; stock Spark capability exposed by the analytical layer)",
    bench=True,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bq_rollup_orders")
    return spark.sql(_ROLLUP_SQL.format(table="bq_rollup_orders"))


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       COUNT(*) AS cnt
FROM {table}
GROUP BY CUBE(o_orderstatus, o_orderpriority)"""


@register(
    "cube_counts",
    _CUBE_SQL.format(table="orders"),
    doc="§2.4 extension: CUBE over status × priority",
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bq_cube_orders")
    return spark.sql(_CUBE_SQL.format(table="bq_cube_orders"))


_GSETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
       COUNT(*) AS cnt
FROM {table}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""


@register(
    "grouping_sets_counts",
    _GSETS_SQL.format(table="orders"),
    doc="§2.4 extension: explicit GROUPING SETS (status totals, priority "
        "totals, grand total in one pass)",
)
def grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bq_gsets_orders")
    return spark.sql(_GSETS_SQL.format(table="bq_gsets_orders"))


# ------------------------------------------------ exact count-distinct


@register(
    "distinct_users_by_type",
    """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS cnt
       FROM events GROUP BY event_type""",
    doc="§2.4: exact COUNT(DISTINCT) per group (approx_count_distinct is "
        "engine-private HLL, so the oracle-checked flavor is exact)",
)
def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    import pyspark.sql.functions as F

    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"), F.count("*").alias("cnt")
    )


# ----------------------------------------------------- anomaly detection

_ZSCORE_SQL = f"""
WITH stats AS (
  SELECT event_type,
         {C.avg_exact(C.money('value'), 'value', 'mu')},
         {C.stddev_exact('value', C.MONEY, 'sigma')}
  FROM {{table}} GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS cnt,
       CAST(SUM(CASE WHEN ABS(e.value - s.mu) > 3.0 * s.sigma THEN 1 ELSE 0 END)
            AS BIGINT) AS outliers_3sigma,
       CAST(SUM(CASE WHEN ABS(e.value - s.mu) > 2.0 * s.sigma THEN 1 ELSE 0 END)
            AS BIGINT) AS outliers_2sigma
FROM {{table}} e JOIN stats s ON e.event_type = s.event_type
GROUP BY e.event_type"""


@register(
    "anomaly_zscore",
    _ZSCORE_SQL.format(table="events"),
    doc="analytics ext: per-group z-score outlier counts — group stats from "
        "exact decimal moments joined back to the stream (two-pass pattern; "
        "identical double comparisons in both engines)",
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("bq_z_events")
    return spark.sql(_ZSCORE_SQL.format(table="bq_z_events"))


# ------------------------------------------------------ sessionization


def _sessionize(engine: str, table: str, gap_minutes: int = 30) -> str:
    epoch_us = (
        "epoch_us(ts)" if engine == D.DUCK else "unix_micros(ts)"
    )
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
    WITH e AS (
      SELECT user_id, event_id, {epoch_us} AS t,
             COALESCE(value, 0.0) AS v
      FROM {table}
    ),
    flagged AS (
      SELECT user_id, event_id, t, v,
             CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                       > {gap_us}
                  OR LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sess AS (
      SELECT user_id, t, v,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY t, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(t) AS start_us, MAX(t) AS end_us, COUNT(*) AS n_events,
           {C.sum_exact(C.money('v'), 'total_value')}
    FROM sess GROUP BY user_id, session_id"""


@register(
    "sessionize_events",
    _sessionize(D.DUCK, "events"),
    doc="§2.9: gap-based sessionization (batch twin of the "
        "applyInPandasWithState streaming operator); epoch-µs keys avoid "
        "ns/µs timestamp precision skew between engines",
    bench=True,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("bq_sess_events")
    return spark.sql(_sessionize(D.SPARK, "bq_sess_events"))


# --------------------------------------- closed-form linear regression


def _linreg(engine: str, table: str) -> str:
    """OLS l_extendedprice ~ l_quantity via exact decimal moments: the
    SQL-expressible core of the ML layer (the GBT pipeline itself is
    checked in pytest; this gives the driver an oracle-checkable ML
    surface). Double arithmetic derives from exact decimal sums; once a
    scaled sum exceeds 2^53 the decimal→double CAST itself rounds
    differently across engines (Java correctly-rounds, DuckDB divides),
    so the derived statistics are rounded to absorb that last-ULP skew
    at large scale factors."""
    x = C.money("l_quantity")
    y = C.money("l_extendedprice")
    sx = f"CAST(SUM({x}) AS DOUBLE)"
    sy = f"CAST(SUM({y}) AS DOUBLE)"
    sxx = f"CAST(SUM({x} * {x}) AS DOUBLE)"
    sxy = f"CAST(SUM({x} * {y}) AS DOUBLE)"
    syy = f"CAST(SUM({y} * {y}) AS DOUBLE)"
    n = "COUNT(*)"
    return f"""
    WITH m AS (
      SELECT {n} AS n, {sx} AS sx, {sy} AS sy, {sxx} AS sxx, {sxy} AS sxy, {syy} AS syy
      FROM {table}
    )
    SELECT n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS r2
    FROM m"""


@register(
    "ml_linreg_closed_form",
    _linreg(D.DUCK, "lineitem"),
    doc="§2.10 oracle-checkable ML: closed-form OLS from exact decimal "
        "moments (GBT/MLlib parity is pytest-gated — nondeterministic "
        "across engines by nature)",
)
def ml_linreg_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("bq_linreg_li")
    return spark.sql(_linreg(D.SPARK, "bq_linreg_li"))


# ------------------------------------------- embedding near-dup pairs


def _near_dup(engine: str, table: str, threshold: float = 0.99) -> str:
    """Candidate band = id-distance ≤ 16, generated as an EXPLODE +
    equi-join (linear in candidates). The first formulation used a range
    theta join, which Spark plans as a nested loop over ALL n² pairs —
    121 s at sf0.1 vs ~1 s for this plan; same rows. The cosine is
    computed once in a subquery so neither engine re-evaluates the fold.
    """
    dim = 64
    band = 16
    if engine == D.DUCK:
        expand = (
            f"SELECT a.vec_id AS id_a, a.embedding AS ea, a.vec_id + o.o AS id_b "
            f"FROM {table} a CROSS JOIN generate_series(1, {band}) o(o)"
        )
    else:
        expand = (
            f"SELECT a.vec_id AS id_a, a.embedding AS ea, "
            f"explode(transform(sequence(1, {band}), o -> a.vec_id + o)) AS id_b "
            f"FROM {table} a"
        )
    prods = D.transform(
        D.iseq("1", str(dim), engine),
        f"i -> CAST({D.at('p.ea', 'i', engine)} AS DOUBLE)"
        f" * CAST({D.at('b.embedding', 'i', engine)} AS DOUBLE)",
        engine,
    )
    dot = D.fold_sum_double(prods, engine)
    na = D.fold_sum_double(
        D.transform(
            D.iseq("1", str(dim), engine),
            f"i -> CAST({D.at('p.ea', 'i', engine)} AS DOUBLE)"
            f" * CAST({D.at('p.ea', 'i', engine)} AS DOUBLE)",
            engine,
        ),
        engine,
    )
    nb = D.fold_sum_double(
        D.transform(
            D.iseq("1", str(dim), engine),
            f"i -> CAST({D.at('b.embedding', 'i', engine)} AS DOUBLE)"
            f" * CAST({D.at('b.embedding', 'i', engine)} AS DOUBLE)",
            engine,
        ),
        engine,
    )
    return f"""
    SELECT id_a, id_b, cos_sim FROM (
      SELECT p.id_a AS id_a, b.vec_id AS id_b,
             round({dot} / (sqrt({na}) * sqrt({nb})), 6) AS cos_sim
      FROM ({expand}) p JOIN {table} b ON b.vec_id = p.id_b
    ) s
    WHERE cos_sim >= {threshold} OR id_b = id_a + 1"""


@register(
    "embedding_near_dup",
    _near_dup(D.DUCK, "embeddings"),
    doc="training-data ext: embedding-cosine near-dup scan over a bounded "
        "deterministic candidate band (id-distance ≤ 16); the unbounded "
        "scale path is operators/similarity.ann_topk_lsh",
    bench=True,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("bq_nd_emb")
    return spark.sql(_near_dup(D.SPARK, "bq_nd_emb"))


# --------------------------------------------- correlation / covariance


def _corr(engine: str, table: str) -> str:
    """Pearson r and sample covariance per group from exact decimal
    moments (same determinism rule as _linreg; corr/covar_samp built-ins
    accumulate doubles partition-order-dependently, so the oracle flavor
    derives them from associative decimal sums instead)."""
    x = C.money("l_quantity")
    y = C.money("l_extendedprice")
    return f"""
    WITH m AS (
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM({x}) AS DOUBLE) AS sx,
             CAST(SUM({y}) AS DOUBLE) AS sy,
             CAST(SUM({x} * {x}) AS DOUBLE) AS sxx,
             CAST(SUM({x} * {y}) AS DOUBLE) AS sxy,
             CAST(SUM({y} * {y}) AS DOUBLE) AS syy
      FROM {table} GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS pearson_r,
           round((sxy - sx * sy / n) / (n - 1), 4) AS covar_samp
    FROM m"""


@register(
    "corr_by_returnflag",
    _corr(D.DUCK, "lineitem"),
    doc="A11 extension: grouped Pearson correlation + sample covariance "
        "(quantity ↔ extendedprice per returnflag) from exact decimal "
        "moments — one hash aggregate with map-side combine, derived "
        "doubles identical in both engines",
)
def corr_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("bq_corr_li")
    return spark.sql(_corr(D.SPARK, "bq_corr_li"))
