"""Data-quality expectation suite as an oracle-checked query (extends
the reference's scalar pipeline gates — Q2 retention / Q3 min-rowcount,
ex06_airflow/dags/full_pipeline_dag.py — to declarative column-level
contracts evaluated in ONE table scan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..quality import expectation_report
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
