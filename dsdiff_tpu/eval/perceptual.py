"""Perceptual feature distance (LPIPS-shaped, weight-file optional).

The reference uses pretrained LPIPS / RadImageNet backbones
(loss_function/perceptual_loss.py:21-365, ldm LPIPS in contperceptual.py:18).
Pretrained weights cannot be downloaded in this environment, so the backbone
here is a fixed, seed-deterministic random conv pyramid — random-feature
perceptual distances are a documented effective proxy (random VGG features
retain the metric's spatial-frequency sensitivity) — with the same call
contract, and a hook to load real backbone parameters from a local file when
available.
"""
from __future__ import annotations

from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PerceptualLoss"]


class _FeaturePyramid(nn.Module):
    widths: tuple = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        for i, w in enumerate(self.widths):
            h = nn.Conv(w, (3, 3), padding=1, name=f"conv{i}a")(h)
            h = nn.relu(h)
            h = nn.Conv(w, (3, 3), padding=1, name=f"conv{i}b")(h)
            h = nn.relu(h)
            feats.append(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        return feats


class PerceptualLoss:
    """d(x, y) = sum_l mean( (norm(f_l(x)) - norm(f_l(y)))^2 ).

    x, y: [B, H, W, C] in [-1, 1]; single-channel inputs are repeated to 3
    channels like the reference (contperceptual.py:54-55).
    """

    def __init__(self, seed: int = 0, weights_path: str | None = None):
        self.net = _FeaturePyramid()
        dummy = jnp.zeros((1, 64, 64, 3))
        self.params = self.net.init(jax.random.PRNGKey(seed), dummy)
        if weights_path and Path(weights_path).exists():
            import pickle

            with open(weights_path, "rb") as f:
                self.params = pickle.load(f)
        self._fn = jax.jit(self._distance)

    def _distance(self, params, x, y):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
            y = jnp.repeat(y, 3, axis=-1)
        fx = self.net.apply(params, x)
        fy = self.net.apply(params, y)
        total = 0.0
        for a, b in zip(fx, fy):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            total = total + jnp.mean((a - b) ** 2, axis=(1, 2, 3))
        return total

    def __call__(self, x, y):
        return self._fn(self.params, x, y)

    def distance_fn(self):
        """(params-closed) pure fn for use inside other jitted steps."""
        params = self.params

        def fn(x, y):
            return self._distance(params, x, y)

        return fn
