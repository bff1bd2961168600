"""Registry-wide physical-plan shape audit (r12 optimization evidence).

For every registry query, plans the DataFrame (no timed execution; the
iterative/eager-bounded operators run their builder-side jobs, as they
would for any caller) and reports the recompute / boundary signatures
the optimization guide says to hunt:

- parquet scans per source table (>=2 scans of one table in one plan is
  the CTE-inlining / shared-frontier recompute class),
- Exchange vs ReusedExchange counts,
- BatchEvalPython / ArrowEvalPython / MapInArrow / MapInPandas nodes,
- BroadcastNestedLoopJoin / CartesianProduct occurrences.

Usage: python scripts/audit_plan_shapes.py [--sf-dir DIR] [names...]
Prints one TSV line per query, worst multi-scan offenders last.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY
from nyc_taxi_bigdata_pipeline_spark.plans.explain import physical_plan
from nyc_taxi_bigdata_pipeline_spark.session import get_spark

_SCAN_RE = re.compile(r"Scan parquet|FileScan parquet")
# bare shuffle Exchange nodes only: exclude ReusedExchange and
# BroadcastExchange, and count TREE lines only (the formatted details
# section repeats node names — r12 ADVICE: the substring count
# overlapped and inflated the exch/reused columns)
_EXCH_RE = re.compile(r"^[^(]*(?<![A-Za-z])Exchange ", re.MULTILINE)
_REUSED_RE = re.compile(r"^[^(]*ReusedExchange\b", re.MULTILINE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("plan-shape-audit")
    names = args.names or list(REGISTRY)
    rows = []
    for name in names:
        try:
            df = REGISTRY[name].spark_fn(spark, args.sf_dir)
            plan = physical_plan(df)
        except Exception as e:  # noqa: BLE001 - audit tool, keep sweeping
            print(f"{name}\tERROR\t{type(e).__name__}: {e}", file=sys.stderr)
            continue
        scans = len(_SCAN_RE.findall(plan))
        per_table: dict[str, int] = {}
        for m in re.finditer(r"Location: InMemoryFileIndex[^\[]*\[([^\]]+)", plan):
            tbl = os.path.basename(m.group(1).split(",")[0].rstrip("/"))
            per_table[tbl] = per_table.get(tbl, 0) + 1
        multi = {t: c for t, c in per_table.items() if c >= 2}
        rows.append(
            (
                name,
                scans,
                len(_EXCH_RE.findall(plan)),
                len(_REUSED_RE.findall(plan)),
                plan.count("BatchEvalPython"),
                plan.count("ArrowEvalPython")
                + plan.count("MapInArrow")
                + plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas"),
                plan.count("BroadcastNestedLoopJoin"),
                plan.count("CartesianProduct"),
                ";".join(f"{t}x{c}" for t, c in sorted(multi.items())),
            )
        )
        # keep the session lean across 200 plan builds
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)

    rows.sort(key=lambda r: (bool(r[8]), r[1]))
    print("name\tscans\texch\treused\tbatchpy\tarrowpy\tbnlj\tcart\tmulti_scan_tables")
    for r in rows:
        print("\t".join(str(x) for x in r))
    spark.stop()


if __name__ == "__main__":
    main()
