"""Timing / profiling helpers.

Replaces the reference's std::chrono frame-phase timers + ImGui FPS overlay
(src/main.cpp:84-118, src/gui.cpp:444-491) with a fetch-synchronized
benchmark harness and optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class PhaseTimer:
    """Accumulates named phase times like the reference's state/render/display
    split (main.cpp:84-118)."""

    totals: dict = field(default_factory=dict)
    counts: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            k: {"total_s": v, "mean_ms": 1e3 * v / max(self.counts[k], 1)}
            for k, v in self.totals.items()
        }


def benchmark(fn, *args, warmup: int = 2, iters: int = 10, **kw) -> dict:
    """Steady-state timing of a jitted function (device-synchronized)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "mean_ms": dt * 1e3, "iters": iters}


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace around a block (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
