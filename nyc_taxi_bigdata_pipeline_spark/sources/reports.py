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


class StageLogger:
    """Q6: stage timing + rowcount log (logging_config.py:84-180),
    accumulated into a summary dict suitable for write_json_report."""

    def __init__(self) -> None:
        self.stages: list[dict[str, Any]] = []

    @contextmanager
    def stage(self, name: str, **meta: Any):
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
            entry["seconds"] = round(time.perf_counter() - t0, 3)
            self.stages.append(entry)
            log.info("stage_end %s %.3fs %s", name, entry["seconds"], entry["status"])

    def summary(self) -> dict[str, Any]:
        return {
            "stages": self.stages,
            "total_seconds": round(sum(s["seconds"] for s in self.stages), 3),
            "ok": all(s["status"] == "ok" for s in self.stages),
        }
