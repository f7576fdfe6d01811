"""Profiling & metrics: per-stage wall timers and XLA profiler hooks.

The reference's profiling is ad-hoc wall-clock prints scattered through the
code (SURVEY.md §5 "Tracing / profiling"); here it is a small subsystem:

- ``StageTimer``: named stage accumulator (count/total/mean/max) the engine
  and extractor use; snapshots are attached to results and exposed by the
  server.
- ``device_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (set ``BB_OCR_PROFILE_DIR`` to enable in
  production paths).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from typing import Dict, Optional


class StageTimer:
    """Thread-safe named-stage wall-clock accumulator."""

    def __init__(self):
        self._lock = threading.Lock()
        self._stats: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                s = self._stats.setdefault(
                    name, {"count": 0, "total_s": 0.0, "max_s": 0.0}
                )
                s["count"] += 1
                s["total_s"] += dt
                s["max_s"] = max(s["max_s"], dt)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            out = {}
            for name, s in self._stats.items():
                out[name] = {
                    "count": int(s["count"]),
                    "total_s": round(s["total_s"], 4),
                    "mean_s": round(s["total_s"] / max(s["count"], 1), 4),
                    "max_s": round(s["max_s"], 4),
                }
            return out

    def reset(self) -> None:
        with self._lock:
            self._stats.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """jax.profiler trace when a directory is configured; no-op otherwise."""
    log_dir = log_dir or os.environ.get("BB_OCR_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
