"""Tracing / profiling utilities.

The reference's observability is a frametime timer + the ``-bench`` stdout
protocol (main.cpp:1588, 2864-2871) and rich in-UI readouts (SURVEY §5).
Here: a frame timer with the same stdout protocol, per-trace ray statistics
(status counts, step histograms, Mrays/s), and an optional ``jax.profiler``
trace context for XLA-level profiling.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import NamedTuple

import numpy as np


class TraceStats(NamedTuple):
    """Summary of a finished trace batch."""

    n_rays: int
    escaped: int
    dead: int
    unfinished: int
    steps_mean: float
    steps_p50: float
    steps_p99: float
    steps_max: int

    def __str__(self) -> str:
        return (
            f"rays={self.n_rays} escaped={self.escaped} dead={self.dead} "
            f"unfinished={self.unfinished} steps(mean={self.steps_mean:.0f} "
            f"p50={self.steps_p50:.0f} p99={self.steps_p99:.0f} "
            f"max={self.steps_max})"
        )


def trace_stats(final_state) -> TraceStats:
    """Statistics from a final RayState (host-side)."""
    status = np.asarray(final_state.status)
    steps = np.asarray(final_state.steps)
    return TraceStats(
        n_rays=int(status.size),
        escaped=int((status == 1).sum()),
        dead=int((status == 2).sum()),
        unfinished=int((status == 0).sum()),
        steps_mean=float(steps.mean()),
        steps_p50=float(np.percentile(steps, 50)),
        steps_p99=float(np.percentile(steps, 99)),
        steps_max=int(steps.max()),
    )


@dataclasses.dataclass
class FrameTimer:
    """Frametime tracker speaking the reference's bench protocol
    ("Frametime Elapsed: %f" must never change — main.cpp:2864-2871)."""

    print_protocol: bool = False
    _t0: float = 0.0
    times_ms: list = dataclasses.field(default_factory=list)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_rays: int | None = None) -> float:
        ms = (time.perf_counter() - self._t0) * 1e3
        self.times_ms.append(ms)
        if self.print_protocol:
            print(f"Frametime Elapsed: {ms:f}")
        return ms

    @contextlib.contextmanager
    def frame(self):
        self.start()
        yield
        self.stop()

    @property
    def median_ms(self) -> float:
        return float(np.median(self.times_ms)) if self.times_ms else 0.0

    def mrays_per_s(self, n_rays: int) -> float:
        if not self.times_ms:
            return 0.0
        return n_rays / (self.median_ms / 1e3) / 1e6


@contextlib.contextmanager
def xla_profile(log_dir: str):
    """jax.profiler trace context (TensorBoard-readable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
