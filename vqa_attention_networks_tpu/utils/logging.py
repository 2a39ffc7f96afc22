"""Structured metric writer.

The reference logs per-epoch scalars through tensorboardX
(solver.py:31,116-117) with tag families ``<model>/loss`` and ``<model>/acc``.
This writer keeps the same tag names and fans out to:

- a JSONL event stream (always; machine-readable, no extra deps),
- TensorBoard via ``tensorboardX``/``torch.utils.tensorboard`` when present,
- stdout summaries.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class NullMetricWriter:
    """Write-nothing twin for non-primary hosts in multi-process runs."""

    def add_scalars(self, tag, values, step) -> None:
        pass

    def add_scalar(self, tag, value, step) -> None:
        pass

    def close(self) -> None:
        pass


class MetricWriter:
    def __init__(self, log_dir: str = "runs", run_name: Optional[str] = None):
        run_name = run_name or time.strftime("%Y%m%d-%H%M%S")
        self.log_dir = os.path.join(log_dir, run_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "events.jsonl"), "a")
        self._tb = self._try_tensorboard()

    def _try_tensorboard(self):
        # Opt-in: tensorboardX spawns background writer threads per
        # SummaryWriter, which is unwanted overhead on constrained hosts.
        # The JSONL stream always carries the same scalars.
        if not os.environ.get("VQA_TENSORBOARD"):
            return None
        for modname, attr in (
            ("tensorboardX", "SummaryWriter"),
            ("torch.utils.tensorboard", "SummaryWriter"),
        ):
            try:
                mod = __import__(modname, fromlist=[attr])
                return getattr(mod, attr)(self.log_dir)
            except Exception:
                continue
        return None

    def add_scalars(self, tag: str, values: Dict[str, float], step: int) -> None:
        """Same call shape as the reference's writer (solver.py:116-117).

        Metric keys that collide with the record's metadata fields
        ("tag"/"step"/"time") are written with a "metric_" prefix instead
        of silently clobbering the event's identity."""
        rec = {"tag": tag, "step": int(step), "time": time.time()}
        for k, v in values.items():
            key = f"metric_{k}" if k in ("tag", "step", "time") else k
            rec[key] = float(v)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            try:
                self._tb.add_scalars(tag, values, step)
            except Exception:
                pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self.add_scalars(tag, {"value": value}, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            try:
                self._tb.close()
            except Exception:
                pass
