"""Profiling: step timers, FLOP estimation, device profiler traces.

Replaces the reference's profiling surface (SURVEY.md §5): Lightning
AdvancedProfiler + wall-clock epoch timers (trainers/trainer_ds_diff.py:
34-38,508-530), logger profile_kv scopes (Disc_diff logger.py:294-323), and
the thop FLOP hooks (openaimodel.py:476-494) — with jax.profiler traces,
XLA cost analysis for exact compiled FLOPs, and steps/sec/chip reporting
(the BASELINE.json first-class metric).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["StepTimer", "profile_scope", "trace", "compiled_flops",
           "steps_per_sec_per_chip"]

_scopes: dict = defaultdict(float)


class StepTimer:
    """Rolling steps/sec with device sync on read."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0


@contextlib.contextmanager
def profile_scope(name: str):
    """Accumulating wall-clock scope (logger.py profile_kv parity); also
    emits a TraceAnnotation so the scope shows up in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _scopes[name] += time.perf_counter() - t0


def scope_totals() -> dict:
    return dict(_scopes)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_flops(fn, *args, **kwargs) -> float:
    """Exact FLOPs of the compiled executable via XLA cost analysis
    (replaces the thop estimation hooks)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", -1.0))


def steps_per_sec_per_chip(step_time_s: float, n_chips: int = 1) -> float:
    return 1.0 / (step_time_s * n_chips) if step_time_s > 0 else 0.0
