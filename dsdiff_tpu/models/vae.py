"""KL-VAE first stage for latent diffusion.

TPU-native re-design of the SD conv autoencoder
(ldm/modules/diffusionmodules/model.py: Encoder :452-544, Decoder :546-650,
ResnetBlock :83-132, AttnBlock/make_attn :190-280) and the
DiagonalGaussianDistribution (ldm/modules/distributions/distributions.py:24-62),
wrapped as :class:`AutoencoderKL` (ldm/models/autoencoder.py:26-499) with the
1-channel medical override (:46-48). Training (GAN/LPIPS loss, two-optimizer
loop) lives in :mod:`dsdiff_tpu.train.vae_trainer`.

NHWC; the latent scale factor (0.18215 for SD weights) is applied by the
latent-diffusion pipeline, not here.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import scaled_attention
from .layers import GroupNorm32

__all__ = ["AutoencoderKL", "DiagonalGaussian", "Encoder", "Decoder"]

Dtype = Any


class DiagonalGaussian(NamedTuple):
    """moments [B,h,w,z] pair; sample/kl/nll/mode as methods
    (distributions.py:24-62)."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=(1, 2, 3),
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar
            + (sample - self.mean) ** 2 / jnp.exp(self.logvar),
            axis=(1, 2, 3),
        )


class _VaeResBlock(nn.Module):
    """time-free ResnetBlock (model.py:83-132)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if C != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class _VaeAttnBlock(nn.Module):
    """single-head spatial attention at the bottleneck (model.py:190-244)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h)
        out = scaled_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(C, dtype=self.dtype, name="proj_out")(out)
        return x + out.reshape(B, H, W, C)


class Encoder(nn.Module):
    """conv encoder -> 2*z_channels moments (model.py:452-544)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = _VaeResBlock(self.ch * mult, dtype=self.dtype,
                                 name=f"down_{level}_{i}")(h)
            if level != len(self.ch_mult) - 1:
                # asymmetric pad + stride-2 conv (model.py:134-147)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                            padding="VALID", dtype=self.dtype,
                            name=f"down_{level}_ds")(h)
        C = h.shape[-1]
        h = _VaeResBlock(C, dtype=self.dtype, name="mid_res1")(h)
        h = _VaeAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = _VaeResBlock(C, dtype=self.dtype, name="mid_res2")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


class Decoder(nn.Module):
    """latent -> image conv decoder (model.py:546-650)."""

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        C = self.ch * self.ch_mult[-1]
        h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype)
        )
        h = _VaeResBlock(C, dtype=self.dtype, name="mid_res1")(h)
        h = _VaeAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = _VaeResBlock(C, dtype=self.dtype, name="mid_res2")(h)
        for level, mult in reversed(list(enumerate(self.ch_mult))):
            for i in range(self.num_res_blocks + 1):
                h = _VaeResBlock(self.ch * mult, dtype=self.dtype,
                                 name=f"up_{level}_{i}")(h)
            if level != 0:
                B, H, W, c = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, c), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{level}_us")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """Encoder + quant convs + Decoder (ldm/models/autoencoder.py:26-108).

    ``embed_dim`` is the latent channel count after the 1x1 quant conv.
    """

    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 1
    out_channels: int = 1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, z_channels=self.z_channels,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            out_channels=self.out_channels, dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng: jax.Array, sample_posterior: bool = True):
        post = self.encode(x)
        z = post.sample(rng) if sample_posterior else post.mode()
        return self.decode(z), post
