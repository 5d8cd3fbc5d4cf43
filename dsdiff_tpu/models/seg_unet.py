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

__all__ = [
    "FFParser",
    "SegUNet",
    "HighwayUNet",
    "MedSegDiffUNet",
    "sliding_window_inference",
]

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


class HighwayUNet(nn.Module):
    """Condition-side 'highway' network of MedSegDiff
    (Generic_UNet(highway=True / anchor_out=True), seg_UNet.py:2267-2525).

    A SegUNet trunk whose encoder can FUSE features handed over from the
    diffusion U-Net: at each level the external feature is 1x1-projected,
    FFParser-filtered, and turned into a multiplicative spatial gate ``ha``
    plus a channel gate ``hb`` (seg_UNet.py:2493-2502: x = x * ha * hb).

    Returns, per mode:
    - fuse mode (``hs`` given): (bottleneck embedding [B, h', w', emb_dim],
      cal seg map) — UNetModel_v1preview's ``uemb``/``cal`` (:794-802),
    - anchor mode (``hs`` None, ``anchor_out``): (list of full-res decoder
      anchor maps, cal) — UNetModel_newpreview's ``anch``/``cal``
      (:1096-1102).
    """

    in_channels: int = 3
    base_features: int = 32
    num_pool: int = 4
    max_features: int = 320
    emb_dim: int = 512
    num_classes: int = 1
    anchor_out: bool = False
    dtype: Dtype = jnp.float32

    def _feat(self, level):
        return min(self.base_features * (2**level), self.max_features)

    @nn.compact
    def __call__(self, x, hs=None):
        h = x.astype(self.dtype)
        skips = []
        for lvl in range(self.num_pool):
            f = self._feat(lvl)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"down_{lvl}_a")(h)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"down_{lvl}_b")(h)
            skips.append(h)
            # pool THEN fuse, so external diffusion features (which arrive
            # post-downsample, at /2^(lvl+1)) gate at matching resolution
            # (Generic_UNet.forward: td[d] before the hs fusion, :2491-2502)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            if hs is not None and lvl < len(hs):
                ext = hs[lvl].astype(self.dtype)
                ext = nn.Conv(f, (1, 1), dtype=self.dtype,
                              name=f"hw_{lvl}_proj")(ext)
                ext = FFParser(ext.shape[1], ext.shape[2],
                               name=f"hw_{lvl}_ff")(ext)
                ha = nn.Conv(f, (1, 1), dtype=self.dtype,
                             name=f"hw_{lvl}_gate")(ext)
                hb = jnp.mean(ext, axis=(1, 2), keepdims=True)
                h = h * ha * hb
        f = self._feat(self.num_pool)
        h = _ConvBlock(f, 1, dtype=self.dtype, name="bottleneck_a")(h)
        h = _ConvBlock(f, 1, dtype=self.dtype, name="bottleneck_b")(h)
        emb = nn.Conv(self.emb_dim, (1, 1), dtype=self.dtype,
                      name="emb_proj")(h)

        anchors = []
        for lvl in reversed(range(self.num_pool)):
            f = self._feat(lvl)
            h = nn.ConvTranspose(f, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up_{lvl}_tr")(h)
            h = jnp.concatenate([h, skips[lvl].astype(h.dtype)], axis=-1)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"up_{lvl}_a")(h)
            h = _ConvBlock(f, 1, dtype=self.dtype, name=f"up_{lvl}_b")(h)
            if self.anchor_out and lvl <= 1:
                # full-res anchor maps (upscale_logits capability)
                a = h
                if lvl > 0:
                    B, H, W, C = a.shape
                    a = jax.image.resize(
                        a, (B, H * 2**lvl, W * 2**lvl, C), "bilinear"
                    )
                anchors.append(a.astype(jnp.float32))
        cal = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="seg_out")(h).astype(jnp.float32)
        if self.anchor_out:
            return anchors[::-1], cal  # highest-resolution first
        return emb.astype(jnp.float32), cal


class MedSegDiffUNet(nn.Module):
    """MedSegDiff denoiser variants (seg_UNet.py UNetModel_v1preview :497-803
    and UNetModel_newpreview :805-1110), TPU-native.

    The input is ``[x_t | condition image]`` along channels (x_t first,
    ``xt_channels`` wide — the step._denoiser concat convention; the
    reference keeps x_t last, a pure layout choice). Two highway modes:

    - ``mode='highway'`` (v1preview): the condition runs through
      :class:`HighwayUNet` fused with the diffusion encoder's per-level
      downsample features; its bottleneck embedding is added before the
      middle block (:794-795).
    - ``mode='anchor'`` (newpreview): the highway runs on the condition
      alone; its full-res anchor maps are added (stop-gradient) to the stem
      activation (:1096-1102).

    Returns (eps/v prediction, {"cal": calibration seg map}).
    """

    xt_channels: int = 1
    out_channels: int = 1
    model_channels: int = 32
    num_res_blocks: int = 1
    attention_resolutions: tuple = (8,)
    channel_mult: tuple = (1, 2, 4, 4)
    num_heads: int = 4
    mode: str = "highway"  # 'highway' | 'anchor'
    highway_features: int = 32
    use_scale_shift_norm: bool = True
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool | None = None, **_):
        from .backbone import OutHead, UNetDecoder, UNetMiddle, UNetEncoder
        from .layers import TimeEmbed

        det = self.deterministic if deterministic is None else deterministic
        cond = x[..., self.xt_channels:]
        emb = TimeEmbed(self.model_channels, 4 * self.model_channels,
                        dtype=self.dtype, name="time_embed")(t)
        common = dict(
            model_channels=self.model_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_heads=self.num_heads,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dropout=self.dropout, deterministic=det, dtype=self.dtype,
        )
        n_pool = len(self.channel_mult) - 1
        hwm = HighwayUNet(
            in_channels=cond.shape[-1],
            base_features=self.highway_features,
            num_pool=n_pool,
            anchor_out=(self.mode == "anchor"),
            dtype=self.dtype, name="hwm",
        )
        h, skips = UNetEncoder(name="encoder", **common)(x, emb)
        if self.mode == "anchor":
            anchors, cal = hwm(cond)
            a1 = anchors[1] if len(anchors) > 1 else anchors[0]
            anch = jnp.concatenate([anchors[0], anchors[0], a1], axis=-1)
            boost = nn.Conv(
                self.model_channels, (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="anchor_proj",
            )(jax.lax.stop_gradient(anch).astype(self.dtype))
            # stem fusion (:1100-1102): skips[0] is the in_conv output
            skips[0] = skips[0] + boost
        else:
            # per-level downsampled encoder features -> highway fusion
            # (reference hs[3], hs[6], hs[9], hs[12] at nrb=2, :794)
            per_level = [
                skips[(self.num_res_blocks + 1) * (d + 1)]
                for d in range(n_pool)
            ]
            uemb, cal = hwm(cond, hs=per_level)
            uemb = jax.image.resize(
                uemb, h.shape[:3] + (uemb.shape[-1],), "bilinear"
            )
            h = h + nn.Conv(h.shape[-1], (1, 1), dtype=self.dtype,
                            name="uemb_proj")(uemb.astype(self.dtype))
        h = UNetMiddle(name="middle", **common)(h, emb)
        h = UNetDecoder(name="decoder", **common)(h, skips, emb)
        out = OutHead(self.out_channels, dtype=self.dtype, name="out")(h)
        return out, {"cal": cal}


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
