"""Data-quality expectation suite as an oracle-checked query (extends
the reference's scalar pipeline gates — Q2 retention / Q3 min-rowcount,
ex06_airflow/dags/full_pipeline_dag.py — to declarative column-level
contracts evaluated in ONE table scan)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..quality import expectation_report, tag_violations
from ..sources.tables import load_table
from .registry import register

_DQ_ORACLE = """
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_key,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_date,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS u_key,
         CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS un_key,
         CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                        AND NOT (o_totalprice BETWEEN 0.0 AND 1000000.0)
                   THEN 1 ELSE 0 END) AS BIGINT) AS r_price,
         CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('F', 'O', 'P')
                   THEN 1 ELSE 0 END) AS BIGINT) AS a_status
  FROM orders),
rows_out AS (
  SELECT 'not_null:o_orderkey' AS check_name, nn_key AS observed FROM a
  UNION ALL SELECT 'not_null:o_orderdate', nn_date FROM a
  UNION ALL SELECT 'unique:o_orderkey', un_key - u_key FROM a
  UNION ALL SELECT 'in_range:o_totalprice', r_price FROM a
  UNION ALL SELECT 'accepted_values:o_orderstatus', a_status FROM a
  UNION ALL SELECT 'min_rows:100',
                   GREATEST(CAST(100 AS BIGINT) - n, CAST(0 AS BIGINT)) FROM a)
SELECT check_name, observed = 0 AS passed, observed FROM rows_out"""


@register(
    "dq_orders_expectations",
    _DQ_ORACLE,
    doc="§2.12 extension: declarative data-quality expectation suite "
        "(Deequ-style) — not-null / uniqueness / range / accepted-values "
        "/ min-rows contracts over orders compiled into ONE aggregate "
        "pass (conditional SUM violation counters + COUNT(DISTINCT) via "
        "a single Expand), then unpivoted to a (check, passed, observed) "
        "report. One table scan for the whole rule set — the 100-TB "
        "difference vs one scan per rule (quality.expectation_report)",
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep = expectation_report(
        load_table(spark, sf_dir, "orders"),
        not_null=["o_orderkey", "o_orderdate"],
        unique=["o_orderkey"],
        ranges={"o_totalprice": (0.0, 1_000_000.0)},
        accepted={"o_orderstatus": ["F", "O", "P"]},
        min_rows=100,
    )
    return rep.withColumnRenamed("check", "check_name")


# Quarantine routing twin: the same row-level rules quality.tag_violations
# compiles, expressed as NULL-skipping concat_ws(CASE…) in shared SQL —
# concat_ws drops NULL arguments identically in Spark and DuckDB, so the
# fixed rule order makes the tag string engine-exact.
_QUARANTINE_ORACLE = """
SELECT tags, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM (
  SELECT concat_ws(';',
    CASE WHEN o_custkey IS NULL THEN 'not_null:o_custkey' END,
    CASE WHEN o_totalprice IS NOT NULL
          AND NOT (o_totalprice BETWEEN 1000.0 AND 200000.0)
         THEN 'in_range:o_totalprice' END,
    CASE WHEN o_orderpriority IS NOT NULL
          AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
         THEN 'accepted_values:o_orderpriority' END) AS tags
  FROM orders) t
GROUP BY tags
ORDER BY tags"""


@register(
    "dq_quarantine_tags",
    _QUARANTINE_ORACLE,
    doc="§2.12 extension: row-level DQ quarantine routing — "
        "quality.tag_violations compiles not-null/range/accepted rules "
        "into per-row violation-tag arrays (codegen'd conditionals, no "
        "shuffle, rides the existing scan); this query pins the tag "
        "distribution against a concat_ws(CASE…) oracle. The sink twin "
        "(quality.quarantine_split) writes clean + quarantined rows in "
        "ONE partitioned pass with Observation-counted stats — the "
        "no-double-scan routing the reference only has at its JSONL "
        "parse boundary (sources/jsonl.py)",
)
def dq_quarantine_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = tag_violations(
        load_table(spark, sf_dir, "orders"),
        not_null=["o_custkey"],
        ranges={"o_totalprice": (1000.0, 200000.0)},
        accepted={"o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"]},
    )
    return (
        tagged.select(F.concat_ws(";", "dq_violations").alias("tags"))
        .groupBy("tags")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
        .orderBy("tags")
    )


# Heavy-key skew diagnostics: the pre-flight report for every salting /
# broadcast / bucketed-interval-join decision in this repo. Shares and
# the skew ratio are exact-integer divisions rounded AFTER the division,
# so both engines produce bit-identical doubles.
_SKEW_ORACLE = """
WITH k AS (
  SELECT l_suppkey AS grp_key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_suppkey),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM k),
t AS (
  SELECT grp_key, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, grp_key) AS INT) AS rn,
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, grp_key
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
  FROM k)
SELECT t.grp_key, t.cnt, t.rn,
       ROUND(CAST(t.cnt AS DOUBLE) / CAST(g.total_rows AS DOUBLE), 6) AS share,
       ROUND(CAST(t.cum_cnt AS DOUBLE) / CAST(g.total_rows AS DOUBLE), 6) AS cum_share,
       g.n_keys, g.total_rows,
       ROUND(CAST(g.max_cnt AS DOUBLE) * CAST(g.n_keys AS DOUBLE)
             / CAST(g.total_rows AS DOUBLE), 4) AS skew_ratio
FROM t CROSS JOIN g WHERE t.rn <= 10"""


@register(
    "skew_key_profile",
    _SKEW_ORACLE,
    doc="§2.12 extension: heavy-key skew diagnostics "
        "(operators/skew.key_skew_profile) — top-10 hottest join/agg "
        "keys with share, cumulative share, and max/mean skew ratio in "
        "one partial-agg shuffle + TakeOrderedAndProject (no global "
        "sort); the pre-flight report for salting / broadcast / "
        "bucketed-interval-join decisions at 100 TB",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_profile

    return key_skew_profile(load_table(spark, sf_dir, "lineitem"), "l_suppkey", 10)
