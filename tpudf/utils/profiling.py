"""Step-time logging and profiler hooks.

The reference's only observability is tqdm postfixes and GPU-memory prints
(SURVEY.md §5). TPU-native equivalents:
  * StepTimer — wall-clock step statistics (mean/p50/p95, steps/sec,
    items/sec) with optional CSV ledger
  * trace() — context manager around jax.profiler for TensorBoard traces
  * device_memory_stats() — per-device live/peak bytes where the backend
    exposes them
"""

from __future__ import annotations

import contextlib
import csv
import os
import time

import numpy as np


class StepTimer:
    def __init__(self, window: int = 200, csv_path: str | None = None):
        self.times: list[float] = []
        self.items: list[int] = []
        self.window = window
        self.csv_path = csv_path
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.items.append(n_items)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.items.pop(0)
        if self.csv_path:
            exists = os.path.exists(self.csv_path)
            with open(self.csv_path, "a", newline="") as f:
                w = csv.writer(f)
                if not exists:
                    w.writerow(["step_time_s", "items"])
                w.writerow([f"{dt:.6f}", n_items])
        return dt

    @contextlib.contextmanager
    def step(self, n_items: int = 1):
        self.start()
        yield
        self.stop(n_items)

    def stats(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        items = float(np.sum(self.items))
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps_per_sec": float(1.0 / t.mean()),
            "items_per_sec": float(items / t.sum()),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpudf_trace"):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    import jax
    try:
        with jax.profiler.trace(log_dir):
            yield log_dir
    except Exception:
        # some backends (tunneled dev chips) lack profiler support
        yield None


def device_memory_stats() -> list[dict]:
    import jax
    out = []
    for d in jax.devices():
        stats = {}
        try:
            raw = d.memory_stats() or {}
            stats = {"bytes_in_use": raw.get("bytes_in_use"),
                     "peak_bytes_in_use": raw.get("peak_bytes_in_use")}
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out
