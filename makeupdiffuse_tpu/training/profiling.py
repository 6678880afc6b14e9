"""Tracing / profiling hooks — the observability tier the reference lacks.

SURVEY §5: the reference's only timing is ad-hoc prints in a smoke script
(/root/reference/diffmk/tst_teacher.py:195-215). Here: a rolling per-step timer
feeding the metrics stream, and jax.profiler trace capture around a chosen step
window (viewable in TensorBoard/Perfetto), gated so unsupported backends degrade to
timing-only.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Rolling wall-clock stats for the train/inference step."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def steps_per_sec(self) -> float:
        m = self.mean
        return 1.0 / m if m > 0 else 0.0

    def scalars(self, prefix: str = "perf/") -> dict:
        return {
            f"{prefix}step_seconds": self.times[-1] if self.times else 0.0,
            f"{prefix}steps_per_sec": self.steps_per_sec,
        }


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str], enabled: bool = True):
    """jax.profiler trace around a step window; silently no-ops where the backend
    doesn't support profiling (e.g. some remote attachments)."""
    if not enabled or log_dir is None:
        yield False
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield started
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def device_memory_stats() -> dict:
    """Per-device memory scalars when the backend exposes them."""
    out = {}
    try:
        for d in jax.local_devices():
            stats = d.memory_stats()
            if stats:
                out[f"mem/{d.id}_bytes_in_use"] = stats.get("bytes_in_use", 0)
                out[f"mem/{d.id}_peak_bytes"] = stats.get("peak_bytes_in_use", 0)
    except Exception:
        pass
    return out
