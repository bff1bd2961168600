"""Executed-plan reuse check (r12): for the plan-shape audit's multi-scan
suspects, run each query once and read the FINAL AQE plan — runtime
ReusedExchange/ReusedSubquery dedup that the initial plan can't show.
Reports per-table scan counts in the EXECUTED plan vs the initial one.

Usage: python scripts/audit_executed_reuse.py [--sf-dir DIR] names...
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
from nyc_taxi_bigdata_pipeline_spark.session import get_spark


def _executed(df) -> str:
    """FINAL AQE plan only. After execution ``executedPlan().toString()``
    prints BOTH the final and the initial plan (``== Initial Plan ==``
    section) — counting over the whole string doubles every per-table
    scan count and inflates ReusedExchange (r12 ADVICE). Slice the
    initial-plan section off before counting."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def _tables(plan: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for m in re.finditer(r"Location: InMemoryFileIndex[^\[]*\[([^\]]+)", plan):
        tbl = os.path.basename(m.group(1).split(",")[0].rstrip("/"))
        out[tbl] = out.get(tbl, 0) + 1
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("executed-reuse-audit")
    for name in args.names:
        df = REGISTRY[name].spark_fn(spark, args.sf_dir)
        df.collect()
        plan = _executed(df)
        tabs = _tables(plan)
        multi = {t: c for t, c in tabs.items() if c >= 2}
        print(
            f"{name}\treused_exch={plan.count('ReusedExchange')}"
            f"\treused_subq={plan.count('ReusedSubquery')}"
            f"\tmulti_scans={';'.join(f'{t}x{c}' for t, c in sorted(multi.items())) or '-'}"
        )
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
    spark.stop()


if __name__ == "__main__":
    main()
