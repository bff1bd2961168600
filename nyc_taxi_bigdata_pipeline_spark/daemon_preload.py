"""Python-worker daemon with the heavy libraries preloaded.

Spark's PythonWorkerFactory reaps idle workers after a HARDCODED one
minute (`IDLE_WORKER_TIMEOUT_NS`, not configurable through 4.1), so any
>1-min stretch of JVM-only queries empties the worker pool and the next
Python-boundary query pays ``cores ×`` worker respawn — dominated by
re-importing numpy/pandas/pyarrow in every fresh worker (measured as
the multimodal_features 3–12 s in-sweep artifact vs 0.8 s solo, r13).

Workers are forked from the daemon process, so importing the libraries
HERE puts them in the daemon's address space and every forked worker
inherits them via copy-on-write: respawn cost drops to a bare fork.
Wired via ``spark.python.daemon.module`` in ``session.get_spark``
(build-time conf; driver-provided sessions simply keep the stock
daemon — this is a performance hint, never a correctness dependency).
"""

import numpy  # noqa: F401  (preload: forked workers inherit via COW)
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
