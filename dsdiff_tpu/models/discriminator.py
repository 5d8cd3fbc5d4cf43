"""PatchGAN discriminator for the VAE GAN loss.

Re-design of the taming-transformers NLayerDiscriminator the reference pulls
in through ldm/modules/losses/contperceptual.py:22-25 (n_layers strided
conv stack, BatchNorm -> we use GroupNorm (batch-stat-free, so the jitted
two-optimizer step stays purely functional), LeakyReLU 0.2, 1-channel logits
map).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["PatchDiscriminator", "hinge_d_loss", "vanilla_d_loss"]

Dtype = Any


class PatchDiscriminator(nn.Module):
    base_channels: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.base_channels, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        h = nn.leaky_relu(h, 0.2)
        ch = self.base_channels
        for i in range(1, self.n_layers + 1):
            ch = self.base_channels * min(2**i, 8)
            stride = 2 if i < self.n_layers else 1
            h = nn.Conv(ch, (4, 4), strides=(stride, stride), padding=1,
                        use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, ch), dtype=jnp.float32,
                             name=f"norm_{i}")(h.astype(jnp.float32)).astype(
                self.dtype)
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


def hinge_d_loss(logits_real, logits_fake):
    """0.5*(mean relu(1-real) + mean relu(1+fake)) (taming vqperceptual)."""
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - logits_real))
        + jnp.mean(nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(nn.softplus(-logits_real))
        + jnp.mean(nn.softplus(logits_fake))
    )
