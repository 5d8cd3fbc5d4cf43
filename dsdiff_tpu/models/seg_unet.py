"""Segmentation networks: FFParser, nnU-Net-style SegUNet, sliding-window.

TPU-native re-design of UNet_DS_Diff/seg_UNet.py:

- :class:`FFParser` (:470-495): learned complex-valued frequency filter —
  rfft2 over the spatial dims, multiply by a trainable complex weight map,
  irfft2 back. XLA lowers the FFTs natively on TPU.
- :class:`SegUNet`: the Generic_UNet capability (:2246-2500) — conv-instnorm-
  lrelu double blocks, strided downsampling, transpose-conv upsampling,
  optional deep supervision heads — as a clean Flax module (the nnU-Net
  plumbing for cascades/pools collapses into config attributes).
- :func:`sliding_window_inference` (:1375-1617 SegmentationNetwork._internal_
  predict_3D_2Dconv_tiled): gaussian-weighted overlapping tiles; the per-tile
  forward is one jitted call, accumulation happens on host numpy.

These power the downstream Dice evaluation of synthesized volumes
(inference/get_dice.py:14-71).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FFParser", "SegUNet", "sliding_window_inference"]

Dtype = Any


class FFParser(nn.Module):
    """Learned frequency-domain filter (seg_UNet.py:470-495)."""

    h: int
    w: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        assert H == self.h and W == self.w, (H, W, self.h, self.w)
        weight = self.param(
            "complex_weight",
            nn.initializers.normal(0.02),
            (H, W // 2 + 1, C, 2),
            jnp.float32,
        )
        xf = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        wc = jax.lax.complex(weight[..., 0], weight[..., 1])
        xf = xf * wc[None]
        out = jnp.fft.irfft2(xf, s=(H, W), axes=(1, 2), norm="ortho")
        return out.astype(x.dtype)


class _ConvBlock(nn.Module):
    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=self.dtype, name="conv")(x)
        # instance norm == GroupNorm with one group per channel
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=jnp.float32,
                         name="norm")(h.astype(jnp.float32)).astype(h.dtype)
        return nn.leaky_relu(h, 0.01)


class SegUNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 2
    base_features: int = 32
    num_pool: int = 5
    max_features: int = 320
    deep_supervision: bool = False
    dtype: Dtype = jnp.float32

    def _feat(self, level):
        return min(self.base_features * (2**level), self.max_features)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = x.astype(self.dtype)
        skips = []
        for lvl in range(self.num_pool):
            f = self._feat(lvl)
            stride = 1 if lvl == 0 else 2
            h = _ConvBlock(f, stride, dtype=self.dtype,
                           name=f"down_{lvl}_a")(h)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"down_{lvl}_b")(h)
            skips.append(h)
        f = self._feat(self.num_pool)
        h = _ConvBlock(f, 2, dtype=self.dtype, name="bottleneck_a")(h)
        h = _ConvBlock(f, 1, dtype=self.dtype, name="bottleneck_b")(h)

        seg_outputs = []
        for lvl in reversed(range(self.num_pool)):
            f = self._feat(lvl)
            h = nn.ConvTranspose(f, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up_{lvl}_tr")(h)
            h = jnp.concatenate([h, skips[lvl].astype(h.dtype)], axis=-1)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"up_{lvl}_a")(h)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"up_{lvl}_b")(h)
            if self.deep_supervision or lvl == 0:
                seg_outputs.append(
                    nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                            name=f"seg_{lvl}")(h).astype(jnp.float32)
                )
        if self.deep_supervision:
            return seg_outputs[::-1]  # highest resolution first
        return seg_outputs[-1]


def _gaussian_importance(tile: int) -> np.ndarray:
    """Center-weighted tile mask (nnU-Net _get_gaussian)."""
    x = np.arange(tile) - (tile - 1) / 2.0
    sigma = tile / 8.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    m = np.outer(g, g)
    return (m / m.max()).astype(np.float32)


def sliding_window_inference(
    apply_fn,
    params,
    volume: np.ndarray,
    tile: int = 256,
    overlap: float = 0.5,
    num_classes: int = 2,
    batch: int = 8,
):
    """Tiled 2D inference over a [H, W, Z, C] volume -> [H, W, Z] labels.

    nnU-Net-style gaussian-weighted overlapping tiles, batched per-slice
    across the z axis; the model call is jitted once per tile shape.
    """
    H, W, Z, C = volume.shape
    step = max(int(tile * (1 - overlap)), 1)
    xs = sorted({min(x, max(H - tile, 0)) for x in range(0, max(H - tile, 0) + step, step)})
    ys = sorted({min(y, max(W - tile, 0)) for y in range(0, max(W - tile, 0) + step, step)})
    gauss = _gaussian_importance(min(tile, H, W))

    jfn = jax.jit(lambda p, x: jax.nn.softmax(apply_fn(p, x), axis=-1))
    logits = np.zeros((H, W, Z, num_classes), np.float32)
    weight = np.zeros((H, W, 1, 1), np.float32)
    th, tw = min(tile, H), min(tile, W)
    for x0 in xs or [0]:
        for y0 in ys or [0]:
            tiles = volume[x0 : x0 + th, y0 : y0 + tw]  # [th, tw, Z, C]
            zbatch = np.moveaxis(tiles, 2, 0)  # [Z, th, tw, C]
            probs = []
            for i in range(0, Z, batch):
                chunk = zbatch[i : i + batch]
                pad = batch - chunk.shape[0]
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad,) + chunk.shape[1:],
                                         chunk.dtype)]
                    )
                out = np.asarray(jfn(params, jnp.asarray(chunk)))
                probs.append(out[: batch - pad] if pad else out)
            p = np.concatenate(probs)  # [Z, th, tw, K]
            p = np.moveaxis(p, 0, 2)  # [th, tw, Z, K]
            g = gauss[:th, :tw, None, None]
            logits[x0 : x0 + th, y0 : y0 + tw] += p * g
            weight[x0 : x0 + th, y0 : y0 + tw] += g[..., :1]
    logits = logits / np.maximum(weight, 1e-8)
    return np.argmax(logits, axis=-1)
