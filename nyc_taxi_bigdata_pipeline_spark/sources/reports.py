"""JSON report sinks + stage logging (S11, Q6).

The reference writes training metrics / error summaries as driver-side
JSON files consumed by its dashboard (``trainer.py:310-338``,
``error_analysis.py:405-419``) and logs per-stage timings/rowcounts
(``logging_config.py:84-180``). Both are bounded driver-side artifacts —
collected small aggregates, never table data.
"""

from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame

log = logging.getLogger("nyc_taxi_bigdata_pipeline_spark")


def write_json_report(obj: dict[str, Any], path: str | Path) -> Path:
    """S11: atomic driver-side JSON artifact."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    tmp.write_text(json.dumps(obj, indent=2, default=str))
    tmp.rename(path)
    return path


def df_to_report(df: DataFrame, max_rows: int = 1000) -> list[dict[str, Any]]:
    """Collect a bounded aggregate result for a report. Guard: refuses
    unbounded frames — reports are for small aggregates only."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"report frame exceeds {max_rows} rows — aggregate before reporting"
        )
    return [r.asDict(recursive=True) for r in rows]


# Per-stage wall-clock budgets mirroring the reference DAG's task SLAs
# (full_pipeline_dag.py:308,363,501,574 — ingestion/DW-load/training/
# inference execution_timeout budgets, scaled to seconds).
DEFAULT_SLAS: dict[str, float] = {
    "ingest": 30 * 60,
    "warehouse": 20 * 60,
    "ml_train": 60 * 60,
    "ml_predict": 15 * 60,
}


class StageLogger:
    """Q6: stage timing + rowcount log (logging_config.py:84-180),
    accumulated into a summary dict suitable for write_json_report.

    A stage may carry an SLA budget (``sla_seconds=...`` or a
    ``DEFAULT_SLAS`` entry keyed by stage name); exceeding it emits a
    WARNING and tags the entry — budget *enforcement* (kill/retry) stays
    with the scheduler, surfacing is the engine's job."""

    def __init__(self, slas: dict[str, float] | None = None) -> None:
        self.stages: list[dict[str, Any]] = []
        self.slas = {**DEFAULT_SLAS, **(slas or {})}

    @contextmanager
    def stage(self, name: str, sla_seconds: float | None = None, **meta: Any):
        budget = sla_seconds if sla_seconds is not None else self.slas.get(name)
        t0 = time.perf_counter()
        log.info("stage_start %s %s", name, meta)
        entry: dict[str, Any] = {"stage": name, **meta}
        try:
            yield entry
            entry["status"] = "ok"
        except Exception as e:  # noqa: BLE001
            entry["status"] = "error"
            entry["error"] = str(e)
            raise
        finally:
            elapsed = time.perf_counter() - t0
            entry["seconds"] = round(elapsed, 3)
            if budget is not None:
                entry["sla_seconds"] = budget
                if elapsed > budget:
                    entry["sla_exceeded"] = True
                    log.warning(
                        "stage_sla_exceeded %s %.3fs > budget %.3fs",
                        name, entry["seconds"], budget,
                    )
            self.stages.append(entry)
            log.info("stage_end %s %.3fs %s", name, entry["seconds"], entry["status"])

    def summary(self) -> dict[str, Any]:
        return {
            "stages": self.stages,
            "total_seconds": round(sum(s["seconds"] for s in self.stages), 3),
            "sla_breaches": [s["stage"] for s in self.stages if s.get("sla_exceeded")],
            "ok": all(s["status"] == "ok" for s in self.stages),
        }
