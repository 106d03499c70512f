"""Tracing / profiling utilities.

The reference has none (SURVEY.md section 5.1 — only tqdm bars). This
module provides the TPU-native equivalents: ``jax.profiler`` trace
capture around any region, and lightweight step-time / throughput
counters for training and serving loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bitdelta_trace"):
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / tokens-per-second meter.

    >>> timer = StepTimer()
    >>> with timer.step(tokens=batch_tokens): run_step()
    >>> timer.summary()
    """

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list = []
        self.tokens: list = []

    class _Tick:
        """Mutable token count for regions whose true token yield is
        only known after the device call (e.g. chunked decode where a
        stop truncates mid-chunk)."""
        __slots__ = ("tokens",)

        def __init__(self, tokens: int):
            self.tokens = tokens

    @contextlib.contextmanager
    def step(self, tokens: int = 0):
        tick = StepTimer._Tick(tokens)
        t0 = time.perf_counter()
        yield tick
        dt = time.perf_counter() - t0
        self.times.append(dt)
        self.tokens.append(tick.tokens)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.tokens.pop(0)

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def tokens_per_sec(self) -> float:
        total_t = sum(self.times)
        return sum(self.tokens) / total_t if total_t > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return {"mean_step_time_s": self.mean_step_time,
                "tokens_per_sec": self.tokens_per_sec,
                "steps_measured": len(self.times)}


def device_memory_stats() -> Optional[Dict[str, float]]:
    """Per-device HBM usage when the backend exposes it."""
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {k: float(v) for k, v in stats.items()
            if isinstance(v, (int, float))}
