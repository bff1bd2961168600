"""Model registry + promotion (ex05 parity, ``model_registry.py``).

Pure-driver state machine: candidate/current model dirs, JSON state,
2-of-3 metric-improvement promotion rule (rmse↓, mae↓, r2↑), bounded
history. Spark appears only through PipelineModel save/load (M11/M12 —
the reference keeps this driver-side too, SURVEY §2.10).
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

from pyspark.ml import PipelineModel

HISTORY_LIMIT = 10  # model_registry.py keeps last-10 history


def improves_2_of_3(candidate: dict[str, float], current: dict[str, float]) -> bool:
    """The 2-of-3 promotion rule (model_registry.py:222-277): candidate
    wins if at least two of {rmse lower, mae lower, r2 higher} hold."""
    wins = 0
    if candidate["rmse"] < current["rmse"]:
        wins += 1
    if candidate["mae"] < current["mae"]:
        wins += 1
    if candidate["r2"] > current["r2"]:
        wins += 1
    return wins >= 2


class ModelRegistry:
    """Filesystem registry: <root>/candidate, <root>/current,
    <root>/state.json."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.state_path = self.root / "state.json"

    # ---------------------------------------------------------- state

    def _load_state(self) -> dict:
        if self.state_path.exists():
            return json.loads(self.state_path.read_text())
        return {"current": None, "history": []}

    def _save_state(self, state: dict) -> None:
        state["history"] = state["history"][-HISTORY_LIMIT:]
        self.state_path.write_text(json.dumps(state, indent=2))

    @property
    def current_metrics(self) -> dict | None:
        cur = self._load_state()["current"]
        return cur["metrics"] if cur else None

    # ------------------------------------------------------- lifecycle

    def register_candidate(self, model: PipelineModel, metrics: dict[str, float],
                           tag: str) -> Path:
        path = self.root / "candidate"
        model.write().overwrite().save(str(path))
        (path / "_metrics.json").write_text(json.dumps({"metrics": metrics, "tag": tag}))
        return path

    def promote_or_discard(self, metrics: dict[str, float], tag: str) -> str:
        """Compare candidate vs current; promote (move) or discard (rm).
        Returns 'promoted' | 'discarded'."""
        state = self._load_state()
        cand = self.root / "candidate"
        if not cand.exists():
            raise FileNotFoundError("no candidate registered")
        current = state["current"]
        decision = "promoted"
        if current is not None and not improves_2_of_3(metrics, current["metrics"]):
            decision = "discarded"
        if decision == "promoted":
            dest = self.root / "current"
            if dest.exists():
                shutil.rmtree(dest)
            shutil.move(str(cand), str(dest))
            state["current"] = {"metrics": metrics, "tag": tag, "ts": time.time()}
        else:
            shutil.rmtree(cand)
        state["history"].append(
            {"tag": tag, "metrics": metrics, "decision": decision, "ts": time.time()}
        )
        self._save_state(state)
        return decision

    def load_current(self) -> PipelineModel:
        return PipelineModel.load(str(self.root / "current"))
