"""Standalone mirror of the driver's correctness gate.

Runs every registry query against its DuckDB oracle and prints a
per-query verdict. Usage:

    python scripts/check_parity.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from nyc_taxi_bigdata_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import run_parity  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="subset of query names (default: all)")
    args = ap.parse_args()

    spark = get_spark("check-parity")
    t0 = time.time()
    results = run_parity(spark, args.sf_dir, args.names or None)
    failed = 0
    for r in results:
        mark = "OK  " if r.ok else "FAIL"
        extra = "" if r.ok and not r.detail.startswith("WARNING") else f"\n      {r.detail}"
        print(f"{mark} {r.name} ({r.spark_rows} rows){extra}")
        failed += not r.ok
    print(f"\n{len(results) - failed}/{len(results)} matched in {time.time() - t0:.0f}s")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
