"""Honest on-device timing for the tunneled TPU backend.

Two measurement hazards (PROFILE.md §1):
- ``jax.block_until_ready`` can return before remote execution completes;
- identical repeat dispatches may be served from a device-side cache and
  independent dispatches can overlap, so loop-and-divide timings read as
  impossibly fast (100x over peak was observed).

``chain_time`` defeats both: the op under test runs inside a
``lax.scan`` where each iteration consumes the previous output (data
dependence forces serial execution), and completion is forced by a scalar
``device_get`` derived from the result.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fetch_scalar", "chain_time"]


def fetch_scalar(out) -> float:
    """Force real completion of `out` (and everything it depends on)."""
    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf.reshape(-1)[:1])))


def chain_time(
    fn: Callable,
    x0,
    length: int = 10,
    couple: Callable | None = None,
    repeats: int = 2,
) -> float:
    """Seconds per `fn` call, measured as a data-dependent scan chain.

    ``fn(x) -> y`` is the op under test; ``couple(x, y) -> x_next`` feeds
    the output back into the next iteration's input (default: x + 1e-6*y,
    requiring matching shapes). Returns best-of-`repeats` per-step time.
    """
    if couple is None:
        def couple(x, y):
            return x + 1e-6 * y.astype(x.dtype)

    @jax.jit
    def chain(x0):
        def body(c, _):
            return couple(c, fn(c)), ()

        return jax.lax.scan(body, x0, None, length=length)[0]

    fetch_scalar(chain(x0))  # compile + warm
    best = float("inf")
    for r in range(repeats):
        xi = jax.tree.map(lambda a: a * (1.0 + (r + 1) * 1e-6), x0)
        fetch_scalar(xi)
        t0 = time.perf_counter()
        fetch_scalar(chain(xi))
        best = min(best, (time.perf_counter() - t0) / length)
    return best
