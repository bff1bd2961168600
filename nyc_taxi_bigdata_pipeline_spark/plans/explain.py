"""Physical-plan inspection helpers.

The 100-TB discipline made testable: every key query asserts its plan
shape — filters reach the parquet scan (PushedFilters), projections
prune the read schema (ReadSchema), small dims broadcast, and the hot
path stays out of Python UDFs. SURVEY §4 maps which Catalyst behaviors
replace the reference's hand-tuning; these helpers pin them in CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Each needle (column name) must appear in some PushedFilters list."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    blob = "\n".join(pushed)
    missing = [n for n in needles if n not in blob]
    assert pushed and not missing, (
        f"filters not pushed to scan: missing={missing}\n{blob or plan}"
    )


def assert_read_schema_pruned(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """The scan matching ``table_hint`` must read ≤ max_cols columns."""
    plan = physical_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln and table_hint in ln:
            body = ln.split("struct<", 1)[-1].rsplit(">", 1)[0]
            ncols = len(body.split(",")) if body else 0
            assert ncols <= max_cols, f"scan of {table_hint} reads {ncols} cols: {ln}"
            return
    raise AssertionError(f"no ReadSchema line for {table_hint} in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, saw {n}:\n{plan}"


def assert_no_python_udf(df: DataFrame) -> None:
    plan = physical_plan(df)
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"Python UDF in hot path ({bad}):\n{plan}"
