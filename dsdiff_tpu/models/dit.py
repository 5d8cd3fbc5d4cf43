"""DiT diffusion transformer with conditional channel-concat.

TPU-native re-design of the vendored Meta DiT (UNet_DS_Diff/DiT_models.py):

- adaLN-Zero blocks (:101-122): per-block 6-way modulation MLP from the
  conditioning embedding, zero-init so each block starts as identity.
- patchify via a strided conv, fixed 2D sin-cos positional embedding
  (:280-327), linear unpatchify head (:219-232) with zero-init final layer.
- the author's conditional-image concat: cond channels are stacked onto x
  before patchify (:241-242), replacing class labels for the medical task
  (class conditioning retained as an option, with CFG label dropout).
- size registry mirrors ``DiT_models`` (:371-376); ``DiT_B_8`` is the
  configured backbone (configs/v2-1-cddpm-ds-disc-openai-diffusion.yaml:68).

Attention uses :func:`dsdiff_tpu.ops.scaled_attention` (Pallas flash kernel on
TPU). All tokens are patch tokens — shapes are static, MXU-aligned when
hidden_size is a multiple of 128 at bf16.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scaled_attention
from .layers import timestep_embedding

__all__ = ["DiT", "DIT_CONFIGS", "make_dit"]

Dtype = Any


def _sincos_2d_pos_embed(dim: int, grid: int) -> np.ndarray:
    """Fixed 2D sin-cos positional embedding (DiT_models.py:280-327)."""
    def _1d(d, pos):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    g = np.arange(grid, dtype=np.float32)
    gy, gx = np.meshgrid(g, g, indexing="ij")
    emb = np.concatenate(
        [_1d(dim // 2, gx), _1d(dim // 2, gy)], axis=1
    )
    return emb.astype(np.float32)  # [grid*grid, dim]


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class _DiTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        # adaLN-Zero: 6 modulation vectors, zero-init projection
        mod = nn.Dense(
            6 * self.hidden, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="adaLN",
        )(nn.silu(c))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm1")(x)
        h = _modulate(h, sh1, sc1)
        B, N, _ = h.shape
        qkv = nn.Dense(3 * self.hidden, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.hidden // self.heads
        q = q.reshape(B, N, self.heads, hd)
        k = k.reshape(B, N, self.heads, hd)
        v = v.reshape(B, N, self.heads, hd)
        attn = scaled_attention(q, k, v).reshape(B, N, self.hidden)
        attn = nn.Dense(self.hidden, dtype=self.dtype, name="proj")(attn)
        x = x + g1[:, None, :] * attn

        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm2")(x)
        h = _modulate(h, sh2, sc2)
        inner = int(self.hidden * self.mlp_ratio)
        h = nn.Dense(inner, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="mlp_fc2")(h)
        return x + g2[:, None, :] * h


class DiT(nn.Module):
    input_size: int = 32
    patch_size: int = 8
    in_channels: int = 1  # x channels (cond concatenated by caller into x)
    out_channels: int = 1
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    class_dropout_prob: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.patch_size
        assert H == W == self.input_size and H % p == 0
        g = H // p

        # patchify: strided conv == PatchEmbed
        h = nn.Conv(
            self.hidden_size, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        h = h.reshape(B, g * g, self.hidden_size)
        pos = jnp.asarray(_sincos_2d_pos_embed(self.hidden_size, g))
        h = h + pos[None].astype(h.dtype)

        # conditioning embedding: timestep (+ label with CFG dropout)
        c = timestep_embedding(t, 256)
        c = nn.Dense(self.hidden_size, dtype=self.dtype, name="t_fc1")(c)
        c = nn.silu(c)
        c = nn.Dense(self.hidden_size, dtype=self.dtype, name="t_fc2")(c)
        if self.num_classes is not None:
            assert y is not None
            # train-time label dropout for CFG (DiT_models.py:33-56); the
            # null class is index num_classes
            if not deterministic and self.class_dropout_prob > 0:
                rng = self.make_rng("dropout")
                drop = (
                    jax.random.uniform(rng, y.shape) < self.class_dropout_prob
                )
                y = jnp.where(drop, self.num_classes, y)
            c = c + nn.Embed(
                self.num_classes + 1, self.hidden_size, dtype=self.dtype,
                name="label_emb",
            )(y)

        for i in range(self.depth):
            h = _DiTBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, name=f"block_{i}",
            )(h, c)

        # final adaLN + zero-init linear head (DiT_models.py:125-142)
        mod = nn.Dense(
            2 * self.hidden_size, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="final_adaLN",
        )(nn.silu(c))
        sh, sc = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype,
                         name="final_norm")(h)
        h = _modulate(h, sh, sc)
        h = nn.Dense(
            p * p * self.out_channels, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, name="final_proj",
        )(h)

        # unpatchify (DiT_models.py:219-232)
        h = h.reshape(B, g, g, p, p, self.out_channels)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, self.out_channels)
        return h.astype(jnp.float32)


# size registry (DiT_models.py:344-376)
DIT_CONFIGS = {
    "DiT_XL_2": dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "DiT_XL_4": dict(depth=28, hidden_size=1152, patch_size=4, num_heads=16),
    "DiT_XL_8": dict(depth=28, hidden_size=1152, patch_size=8, num_heads=16),
    "DiT_L_2": dict(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "DiT_L_4": dict(depth=24, hidden_size=1024, patch_size=4, num_heads=16),
    "DiT_L_8": dict(depth=24, hidden_size=1024, patch_size=8, num_heads=16),
    "DiT_B_2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "DiT_B_4": dict(depth=12, hidden_size=768, patch_size=4, num_heads=12),
    "DiT_B_8": dict(depth=12, hidden_size=768, patch_size=8, num_heads=12),
    "DiT_S_2": dict(depth=12, hidden_size=384, patch_size=2, num_heads=6),
    "DiT_S_4": dict(depth=12, hidden_size=384, patch_size=4, num_heads=6),
    "DiT_S_8": dict(depth=12, hidden_size=384, patch_size=8, num_heads=6),
}


def make_dit(name: str, **kw) -> DiT:
    return DiT(**{**DIT_CONFIGS[name], **kw})
