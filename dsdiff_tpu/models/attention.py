"""Attention library: self/cross attention, FFT attention, spatial transformers.

TPU-native re-design of reference ldm/modules/attention.py:

- One attention primitive behind :func:`dsdiff_tpu.ops.scaled_attention`
  (Pallas flash attention on TPU, fused-XLA fallback elsewhere) instead of the
  vanilla / xformers duality (attention.py:145-297).
- ``FFTAttention`` reproduces FFTCrossAttention (attention.py:197-248): rfft
  of q,k over the head dim, complex similarity, irfft over the key axis to
  the sequence length, softmax, then @ v — on TPU the FFTs lower to XLA's
  native rfft.
- ``SpatialTransformer`` / ``SpatialTransformer`` with ``use_fft`` mirrors
  SpatialTransformer / SpatialTransformer_fft (attention.py:366-493) with the
  ``use_linear`` projection toggle.
- ``AttentionBlock`` is the OpenAI qkv attention over flattened spatial maps
  (ldm/modules/diffusionmodules/openaimodel.py:426-527,
  Disc_diff/guided_diffusion/unet.py:259-352).

Layout: sequences are [B, N, C]; spatial maps [B, H, W, C] are flattened to
tokens inside the transformer, keeping C minor so the projections hit the MXU.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import scaled_attention
from .layers import GroupNorm32, zero_init

__all__ = [
    "CrossAttention",
    "FFTAttention",
    "FeedForward",
    "BasicTransformerBlock",
    "SpatialTransformer",
    "AttentionBlock",
]

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head (self- or cross-) attention (attention.py:145-195).

    ``context=None`` -> self-attention. Head dim fixed via dim_head; q/k/v
    projections are bias-free as in the reference.
    """

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        q_in = x
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(q_in)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, M, self.heads, self.dim_head)
        v = v.reshape(B, M, self.heads, self.dim_head)
        out = scaled_attention(q, k, v)
        out = out.reshape(B, N, inner)
        out = nn.Dense(q_in.shape[-1], dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=self.deterministic)


class FFTAttention(nn.Module):
    """Frequency-domain similarity attention (attention.py:197-248).

    sim = irfft( rfft(q) . rfft(k) , n=M ) over the key axis, softmax, @ v.
    FFTs run in f32 (the reference forces fp32 to avoid overflow)."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qf = jnp.fft.rfft(q.astype(jnp.float32), axis=-1)
        kf = jnp.fft.rfft(k.astype(jnp.float32), axis=-1)
        sim = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale
        sim = jnp.fft.irfft(sim, n=M, axis=-1)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum(
            "bhij,bhjd->bhid", attn.astype(v.dtype), v
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=self.deterministic)


class FeedForward(nn.Module):
    """GEGLU feed-forward (attention.py:55-79)."""

    mult: int = 4
    dropout: float = 0.0
    glu: bool = True
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        if self.glu:
            h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate)
        else:
            h = nn.gelu(nn.Dense(inner, dtype=self.dtype, name="proj_in")(x))
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """pre-LN self-attn -> cross-attn -> FF block (attention.py:302-331);
    ``use_fft`` swaps in FFTAttention (FFTTransformerBlock, :333-363);
    ``disable_self_attn`` makes the first attention cross-conditioned."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_fft: bool = False
    disable_self_attn: bool = False
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        Attn = FFTAttention if self.use_fft else CrossAttention
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attn(
            self.heads, self.dim_head, self.dropout,
            deterministic=self.deterministic, dtype=self.dtype, name="attn1",
        )(h, context if self.disable_self_attn else None)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attn(
            self.heads, self.dim_head, self.dropout,
            deterministic=self.deterministic, dtype=self.dtype, name="attn2",
        )(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(
            dropout=self.dropout, deterministic=self.deterministic,
            dtype=self.dtype, name="ff",
        )(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer over flattened spatial tokens (attention.py:366-493).

    GroupNorm -> (1x1 conv | linear) in-projection -> depth x transformer
    blocks -> zero-init out-projection -> residual. ``use_fft`` gives
    SpatialTransformer_fft.
    """

    depth: int = 1
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_linear: bool = False
    use_fft: bool = False
    disable_self_attn: bool = False
    deterministic: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads, self.dim_head, self.dropout, self.use_fft,
                self.disable_self_attn, deterministic=self.deterministic,
                dtype=self.dtype, name=f"block_{i}",
            )(h, context)
        h = nn.Dense(
            C, kernel_init=zero_init(), dtype=self.dtype, name="proj_out"
        )(h)
        return x_in + h.reshape(B, H, W, C)


class AttentionBlock(nn.Module):
    """OpenAI-style qkv self-attention over a spatial map
    (openaimodel.py:426-527 / Disc unet.py:259-352): GroupNorm -> fused qkv
    1x1 -> heads -> attention -> zero-init 1x1 -> residual."""

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert C % self.num_head_channels == 0
            heads = C // self.num_head_channels
        dim_head = C // heads
        h = GroupNorm32(dtype=self.dtype, name="norm")(x).reshape(B, H * W, C)
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, H * W, heads, dim_head)
        k = k.reshape(B, H * W, heads, dim_head)
        v = v.reshape(B, H * W, heads, dim_head)
        out = scaled_attention(q, k, v).reshape(B, H * W, C)
        out = nn.Dense(
            C, kernel_init=zero_init(), dtype=self.dtype, name="proj_out"
        )(out)
        return x + out.reshape(B, H, W, C)
