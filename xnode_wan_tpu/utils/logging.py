"""Run artifacts and structured metrics.

Keeps the reference's artifact names and schemas (reference
``src/training.py:140-141,169-174``):

* ``losses_NODE_<dim>.json`` — list of per-iteration primal losses,
* ``L2_NODE_<dim>.json``     — list of per-iteration L^p errors
  (the reference re-created this list every iteration so the file only ever
  held one value — fixed here, as SURVEY §5 directs),
* ``Time_NODE_<dim>.json``   — wall-clock stamps per iteration,

plus a structured ``metrics_NODE_<dim>.jsonl`` with one JSON object per
iteration. Host IO is O(1) per flush: the jsonl gets only the records since
the previous flush appended; the three JSON list artifacts (whole-history
snapshots by schema) are rewritten on the final ``flush()`` at stop/end AND
on a coarse periodic cadence (every ``full_flush_every`` jsonl flushes,
default every 250 iterations) so a crashed run — e.g. a device-watchdog
kill on a long high-dimensional run — still leaves reference-format
outputs, without the O(n^2) rewrite-everything-every-25-steps cost on the
thread that drives the device.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List


class RunLogger:
    def __init__(self, dim: int, work_dir: str = "./", flush_every: int = 25,
                 full_flush_every: int = 10):
        self.dim = dim
        self.work_dir = work_dir
        self.flush_every = max(1, flush_every)
        self.full_flush_every = max(1, full_flush_every)
        self.losses: List[float] = []
        self.l2s: List[float] = []
        self.times: List[float] = [time.time()]
        self._records: List[dict] = []
        self._jsonl_written = 0
        self._n_flushes = 0
        os.makedirs(work_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.work_dir, name)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        self.losses.append(float(metrics.get("loss_u", float("nan"))))
        if "L2" in metrics:
            self.l2s.append(float(metrics["L2"]))
        self.times.append(time.time())
        self._records.append({"step": step, "time": self.times[-1],
                              **{k: float(v) for k, v in metrics.items()}})
        if (step + 1) % self.flush_every == 0:
            self._flush_jsonl()
            self._n_flushes += 1
            if self._n_flushes % self.full_flush_every == 0:
                # Coarse crash-safety cadence for the reference-format
                # list artifacts (full rewrite, so kept infrequent).
                self._write_lists()

    def _flush_jsonl(self) -> None:
        """Append records accumulated since the last flush (O(new))."""
        new = self._records[self._jsonl_written:]
        if not new:
            return
        mode = "a" if self._jsonl_written else "w"
        with open(self._path(f"metrics_NODE_{self.dim}.jsonl"), mode) as fh:
            for rec in new:
                fh.write(json.dumps(rec) + "\n")
        self._jsonl_written = len(self._records)

    def _write_lists(self) -> None:
        with open(self._path(f"losses_NODE_{self.dim}.json"), "w") as fh:
            json.dump(self.losses, fh)
        with open(self._path(f"L2_NODE_{self.dim}.json"), "w") as fh:
            json.dump(self.l2s, fh)
        with open(self._path(f"Time_NODE_{self.dim}.json"), "w") as fh:
            json.dump(self.times, fh)

    def flush(self) -> None:
        """Full flush: jsonl tail + the whole-history JSON list artifacts."""
        self._flush_jsonl()
        self._write_lists()
