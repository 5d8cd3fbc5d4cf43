"""Shared building blocks for all denoiser families.

TPU-native re-design of the reference block library
(ldm/modules/diffusionmodules/openaimodel.py + util.py and
Disc_diff/guided_diffusion/{nn.py,unet.py}):

- NHWC layout throughout (XLA's native conv layout on TPU; the reference is
  NCHW torch).
- bfloat16 compute / float32 params via the ``dtype`` attribute; GroupNorm
  statistics always in f32 (the reference's GroupNorm32,
  openaimodel util.py:224-227).
- gradient checkpointing is applied by the caller with ``flax.linen.remat``
  instead of the hand-rolled autograd.Function
  (ldm/modules/diffusionmodules/util.py:109-158).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "timestep_embedding",
    "ModulatedResBlock",
    "TimeEmbed",
    "GroupNorm32",
    "ResBlock",
    "Upsample",
    "Downsample",
    "SEBlock",
    "SpectralNormConv",
    "zero_init",
    "default_init",
]

Dtype = Any

default_init = nn.initializers.lecun_normal()


def zero_init():
    """Zero-init for output layers (reference zero_module,
    openaimodel util.py:211-216)."""
    return nn.initializers.zeros


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [B] -> [B, dim].

    Reference ldm/modules/diffusionmodules/util.py:161-178 (cos/sin halves,
    zero-pad when odd).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimeEmbed(nn.Module):
    """Two-layer SiLU MLP over the sinusoidal embedding
    (openaimodel.py:623-628)."""

    model_channels: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(emb)
        return emb


class GroupNorm32(nn.Module):
    """GroupNorm with f32 statistics regardless of compute dtype
    (reference GroupNorm32, util.py:224-227; 32 groups)."""

    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        y = nn.GroupNorm(num_groups=groups, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        return y.astype(orig_dtype)


class Upsample(nn.Module):
    """2x nearest upsample + optional conv (openaimodel.py:96-132)."""

    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        if self.use_conv:
            x = nn.Conv(
                self.out_channels or C, (3, 3), padding=1, dtype=self.dtype,
                name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv (or avg-pool) downsample (openaimodel.py:135-164)."""

    use_conv: bool = True
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        if self.use_conv:
            return nn.Conv(
                self.out_channels or C, (3, 3), strides=(2, 2), padding=1,
                dtype=self.dtype, name="op",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """GN+SiLU+conv residual block with FiLM timestep conditioning.

    Reference openaimodel.py:167-310: scale-shift norm option
    (``use_scale_shift_norm``), zero-init of the second conv, optional up/down
    resampling inside the block, 1x1 (or 3x3) skip projection on channel
    change. Elementwise chains fuse into the convs under XLA; the Pallas
    fused GroupNorm+SiLU kernel in :mod:`dsdiff_tpu.ops` slots in via
    ``dsdiff_tpu.ops.fused_group_norm_silu`` when enabled.
    """

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        out_ch = self.out_channels or C

        h = GroupNorm32(dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h = Upsample(use_conv=False, dtype=self.dtype, name="h_upd")(h)
            x = Upsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)
        elif self.down:
            h = Downsample(use_conv=False, dtype=self.dtype, name="h_upd")(h)
            x = Downsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
            h = h * (1.0 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
            h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        h = nn.Conv(
            out_ch, (3, 3), padding=1, kernel_init=zero_init(),
            dtype=self.dtype, name="out_conv",
        )(h)

        if C != out_ch:
            skip_kernel = (3, 3) if self.use_conv_skip else (1, 1)
            pad = 1 if self.use_conv_skip else 0
            x = nn.Conv(
                out_ch, skip_kernel, padding=pad, dtype=self.dtype,
                name="skip",
            )(x)
        return x + h


class SpectralNormConv(nn.Module):
    """Conv with spectrally-normalized kernel (reference SpectralNorm,
    UNet_DS_Diff/model.py:65-132).

    The reference carries a persistent power-iteration vector ``u`` updated
    once per forward; here the iteration runs ``n_iter`` steps from a fixed
    deterministic start every call — stateless (jit/GSPMD-friendly) and
    converged to the same sigma for practical n_iter.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 1
    n_iter: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features), jnp.float32,
        )
        w = kernel.reshape(-1, self.features)  # [N, out]
        u = jnp.full((self.features,), 1.0 / math.sqrt(self.features),
                     jnp.float32)
        for _ in range(self.n_iter):
            v = w @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w.T @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        sigma = v @ (w @ u)
        w_sn = (kernel / sigma).astype(self.dtype)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w_sn, window_strides=self.strides,
            padding=pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel gate.

    Reference SE_Attention, Disc_diff/guided_diffusion/unet.py:82-110
    (global-avg-pool -> fc/r -> ReLU -> fc -> sigmoid -> scale), used by the
    DisC and DS U-Nets to fuse disentangled features.
    """

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        s = nn.Dense(max(C // self.reduction, 1), use_bias=False,
                     dtype=self.dtype, name="fc1")(s.astype(self.dtype))
        s = nn.relu(s)
        s = nn.Dense(C, use_bias=False, dtype=self.dtype, name="fc2")(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ModulatedResBlock(nn.Module):
    """ResBlock with dual FiLM: timestep embedding modulates the in-norm,
    an external context map modulates the out-norm.

    Reference ResBlockModulate (openaimodel.py:311-425): emb scale/shift on
    in_norm, context [B, ..., 2*out_ch] scale/shift on out_norm — the
    structure/edge-guidance injection point of the SD UNet variant.
    """

    out_channels: Optional[int] = None
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        C = x.shape[-1]
        out_ch = self.out_channels or C
        emb_out = nn.Dense(2 * C, dtype=self.dtype, name="emb_proj")(
            nn.silu(emb)
        )[:, None, None, :]
        e_scale, e_shift = jnp.split(emb_out, 2, axis=-1)
        h = GroupNorm32(dtype=self.dtype, name="in_norm")(x)
        h = h * (1.0 + e_scale) + e_shift
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        c_scale, c_shift = jnp.split(context.astype(h.dtype), 2, axis=-1)
        h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
        h = h * (1.0 + c_scale) + c_shift
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        h = nn.Conv(out_ch, (3, 3), padding=1, kernel_init=zero_init(),
                    dtype=self.dtype, name="out_conv")(h)
        if C != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h
