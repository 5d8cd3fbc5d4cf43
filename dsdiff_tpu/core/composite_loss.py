"""Composite weighted distance loss mixer.

Re-design of training_project/utils/get_dist_loss.py:3-57: a weighted sum of
L1 / L2 / SSIM / MS-SSIM / perceptual distances between prediction and
target, assembled once from a weights dict and jit-fusable.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..eval import metrics as M

__all__ = ["composite_distance"]


def composite_distance(
    weights: dict,
    perceptual_fn: Callable | None = None,
    data_range: float = 2.0,
):
    """weights keys: l1, l2, ssim, ms_ssim, perceptual. Returns
    fn(pred, target) -> scalar; SSIM terms enter as (1 - ssim)."""

    def fn(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        total = 0.0
        if weights.get("l1"):
            total += weights["l1"] * jnp.mean(jnp.abs(pred - target))
        if weights.get("l2"):
            total += weights["l2"] * jnp.mean((pred - target) ** 2)
        if weights.get("ssim"):
            s = M.ssim(target[..., 0], pred[..., 0], data_range)
            total += weights["ssim"] * jnp.mean(1.0 - s)
        if weights.get("ms_ssim"):
            s = M.ms_ssim(target[..., 0], pred[..., 0], data_range)
            total += weights["ms_ssim"] * jnp.mean(1.0 - s)
        if weights.get("perceptual") and perceptual_fn is not None:
            total += weights["perceptual"] * jnp.mean(
                perceptual_fn(pred, target)
            )
        return total

    return fn
