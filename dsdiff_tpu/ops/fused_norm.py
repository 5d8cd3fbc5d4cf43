"""Pallas fused GroupNorm+SiLU.

Target: the GN->SiLU->conv prologue of every ResBlock
(reference openaimodel.py:222-235 GroupNorm32 + SiLU chains) — the main
HBM-bandwidth consumer outside the convs. Two-pass kernel: grid over batch,
chunked spatial reduction for the group statistics in VMEM scratch, then a
normalize+SiLU pass fused into one write.

Currently gated off (``supports`` returns False) pending the perf pass; the
XLA fallback in :mod:`dsdiff_tpu.ops` fuses acceptably in the meantime.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["group_norm_silu", "supports"]


def supports(x, num_groups: int) -> bool:
    return False


def group_norm_silu(x, scale, bias, num_groups: int = 32):
    raise NotImplementedError("pallas group_norm_silu lands in the perf pass")
