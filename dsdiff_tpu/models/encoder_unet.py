"""Encoder-half U-Net classifier for classifier guidance.

Re-design of EncoderUNetModel (Disc_diff/guided_diffusion/unet.py:1079-1282):
the diffusion U-Net encoder + middle block followed by a pooled
classification head. Pool modes: 'adaptive' (global mean), 'attention'
(attention-pooled spatial tokens), 'spatial' (flatten + MLP).

Used with :func:`classifier_gradient` to build a classifier-guided
denoiser (the guided-diffusion cond_fn pattern).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbone import UNetEncoder, UNetMiddle
from .layers import GroupNorm32, TimeEmbed

__all__ = ["EncoderUNet", "classifier_gradient"]

Dtype = Any


class EncoderUNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 2
    model_channels: int = 64
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    num_heads: int = 4
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    pool: str = "adaptive"  # adaptive | attention | spatial
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        ch0 = self.model_channels
        emb = TimeEmbed(ch0, ch0 * 4, dtype=self.dtype, name="time_embed")(t)
        kw = dict(
            model_channels=ch0,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
        )
        h, _ = UNetEncoder(**kw, name="encoder")(x, emb)
        h = UNetMiddle(**kw, name="middle")(h, emb)
        h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        if self.pool == "adaptive":
            v = jnp.mean(h, axis=(1, 2))
        elif self.pool == "attention":
            B, H, W, C = h.shape
            tokens = h.reshape(B, H * W, C)
            q = self.param("pool_query", nn.initializers.normal(0.02), (C,))
            att = jax.nn.softmax(
                jnp.einsum("bnc,c->bn", tokens, q)
                / jnp.sqrt(jnp.float32(C)),
                axis=-1,
            )
            v = jnp.einsum("bn,bnc->bc", att, tokens)
        elif self.pool == "spatial":
            B = h.shape[0]
            v = nn.Dense(2048, dtype=self.dtype, name="spatial_fc")(
                h.reshape(B, -1)
            )
            v = nn.relu(v)
        else:
            raise ValueError(f"unknown pool '{self.pool}'")
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="out")(v).astype(jnp.float32)


def classifier_gradient(apply_fn, params, x, t, y, scale: float = 1.0):
    """grad_x log p(y|x) * scale (guided-diffusion classifier cond_fn)."""

    def logp(x_in):
        logits = apply_fn(params, x_in, t)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(jnp.take_along_axis(logprobs, y[:, None], axis=1))

    return jax.grad(logp)(x) * scale
