"""Latent-diffusion adapter: frozen KL-VAE around the diffusion pipeline.

Re-design of the reference's latent path
(trainers/trainer_latent_diffusion.py + ldm LatentDiffusion,
ldm/models/diffusion/ddpm.py:527-927):

- the first stage is frozen (instantiate_first_stage,
  ddpm.py:620-633); conditions are encoded per-sequence with posterior
  sampling and concatenated in latent channels
  (trainer_latent_diffusion.py:153-191),
- ``scale_factor`` multiplies encodings (get_first_stage_encoding,
  ddpm.py:660-668); ``scale_by_std`` computes 1/std from the first batch
  (ddpm.py:577-590),
- sampling runs in latent space and decodes at the end
  (sample_log -> decode_first_stage, ddpm.py:1117-1142).

Encode/decode are jitted once; the diffusion trainer sees ordinary
``{'image','target'}`` batches whose arrays happen to be latents.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.vae import AutoencoderKL

__all__ = ["LatentAdapter"]


class LatentAdapter:
    def __init__(
        self,
        vae: AutoencoderKL,
        vae_params,
        scale_factor: float = 0.18215,
        scale_by_std: bool = False,
    ):
        self.vae = vae
        self.params = vae_params
        self.scale_factor = jnp.float32(scale_factor)
        self.scale_by_std = scale_by_std
        self._calibrated = not scale_by_std

        def encode_one(params, x, rng):
            post = vae.apply(params, x, method="encode")
            return post.sample(rng)

        def decode(params, z, scale):
            return vae.apply(params, z / scale, method="decode")

        self._encode_one = jax.jit(encode_one)
        self._decode = jax.jit(decode)
        self.z_channels = vae.embed_dim
        self.downsample = 2 ** (len(vae.ch_mult) - 1)

    def calibrate(self, sample_batch, rng):
        """scale_by_std: scale = 1/std(z) of a reference batch
        (ddpm.py:577-590)."""
        if self._calibrated:
            return
        z = self._encode_one(
            self.params, sample_batch["target"], rng
        )
        self.scale_factor = 1.0 / (jnp.std(z) + 1e-8)
        self._calibrated = True

    def encode_batch(self, batch: dict, rng: jax.Array) -> dict:
        """{'image': [B,H,W,Cc], 'target': [B,H,W,1]} -> latent batch."""
        self.calibrate(batch, rng)
        rngs = jax.random.split(rng, batch["image"].shape[-1] + 1)
        z_cond = []
        for c in range(batch["image"].shape[-1]):
            z = self._encode_one(
                self.params, batch["image"][..., c : c + 1], rngs[c]
            )
            z_cond.append(z * self.scale_factor)
        z_target = (
            self._encode_one(self.params, batch["target"], rngs[-1])
            * self.scale_factor
        )
        out = dict(batch)
        out["image"] = jnp.concatenate(z_cond, axis=-1)
        out["target"] = z_target
        return out

    def encode_cond(self, image: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Conditions only (predict path): [B,H,W,Cc] -> [B,h,w,Cc*z]."""
        rngs = jax.random.split(rng, image.shape[-1])
        z_cond = [
            self._encode_one(self.params, image[..., c : c + 1], rngs[c])
            * self.scale_factor
            for c in range(image.shape[-1])
        ]
        return jnp.concatenate(z_cond, axis=-1)

    def decode_batch(self, z: jnp.ndarray) -> jnp.ndarray:
        return self._decode(self.params, z, self.scale_factor)
