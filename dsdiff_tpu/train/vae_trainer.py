"""KL-VAE GAN training: the two-optimizer loop as two jitted sub-steps.

Re-design of the reference's AutoencoderKL manual optimization
(ldm/models/autoencoder.py:189-230: AE step then discriminator step under
Lightning manual-opt) and LPIPSWithDiscriminator
(ldm/modules/losses/contperceptual.py:7-110):

- AE step: L1 rec + perceptual -> NLL with a learned logvar scalar, + KL
  weight, + adaptive-weighted generator loss. The adaptive weight
  ||d nll/d last|| / ||d g/d last|| over the decoder's out-conv kernel
  (contperceptual.py:32-43) is computed with ONE jax.vjp linearization and
  two cotangent pulls — no retain_graph double backward.
- Disc step: hinge (or vanilla) on real/fake logits, gated on
  ``disc_start`` via a where-mask (adopt_weight, jit-friendly).
- Both sub-steps are separately jitted and donate their states; together
  they express the reference's optimizer_idx 0/1 alternation.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.discriminator import (
    PatchDiscriminator, hinge_d_loss, vanilla_d_loss,
)
from .state import TrainState

__all__ = ["VaeGanConfig", "make_vae_steps"]


@dataclasses.dataclass(frozen=True)
class VaeGanConfig:
    kl_weight: float = 1e-6
    pixel_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_start: int = 50001
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    disc_loss: str = "hinge"  # hinge | vanilla
    decoder_only: bool = False  # finetune decoder only (autoencoder.py:52)


def _last_layer_path(params) -> tuple:
    """Path to the decoder out-conv kernel inside the VAE param tree."""
    return ("params", "decoder", "conv_out", "kernel")


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


def make_vae_steps(
    vae_apply: Callable,
    disc_apply: Callable,
    cfg: VaeGanConfig,
    perceptual_fn: Callable | None = None,
):
    """Returns (ae_step, disc_step), both jitted.

    ae_step(vae_state, disc_params, batch, rng) -> (vae_state, metrics)
    disc_step(disc_state, vae_params, batch, rng) -> (disc_state, metrics)

    batch: {'image': [B,H,W,C] in [-1,1]}.
    """
    d_loss_fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss

    def _reconstruct(params, x, rng):
        rec, post = vae_apply(params, x, rng)
        return rec, post

    def ae_step(vae_state: TrainState, logvar, disc_params, batch, rng):
        x = batch["image"]
        step = vae_state.step

        def loss_fn(params, logvar):
            rec, post = _reconstruct(params, x, rng)
            rec_l = jnp.abs(x - rec)
            rec_l = jnp.mean(rec_l, axis=(1, 2, 3))
            if perceptual_fn is not None and cfg.perceptual_weight > 0:
                rec_l = rec_l + cfg.perceptual_weight * perceptual_fn(x, rec)
            nll = jnp.mean(rec_l / jnp.exp(logvar) + logvar)
            kl = jnp.mean(post.kl())

            logits_fake = disc_apply(disc_params, rec)
            g_loss = -jnp.mean(logits_fake)

            # adaptive d-weight wrt the decoder out-conv kernel
            path = _last_layer_path(params)
            lastp = _get(params, path)

            def through_last(lp):
                p2 = _set(params, path, lp)
                rec2, _ = _reconstruct(p2, x, rng)
                rl = jnp.mean(jnp.abs(x - rec2), axis=(1, 2, 3))
                if perceptual_fn is not None and cfg.perceptual_weight > 0:
                    rl = rl + cfg.perceptual_weight * perceptual_fn(x, rec2)
                nll2 = jnp.mean(rl / jnp.exp(logvar) + logvar)
                g2 = -jnp.mean(disc_apply(disc_params, rec2))
                return jnp.stack([nll2, g2])

            _, vjp = jax.vjp(through_last, lastp)
            nll_grad = vjp(jnp.array([1.0, 0.0]))[0]
            g_grad = vjp(jnp.array([0.0, 1.0]))[0]
            d_weight = jnp.linalg.norm(nll_grad.reshape(-1)) / (
                jnp.linalg.norm(g_grad.reshape(-1)) + 1e-4
            )
            d_weight = jax.lax.stop_gradient(
                jnp.clip(d_weight, 0.0, 1e4) * cfg.disc_weight
            )
            disc_factor = jnp.where(
                step >= cfg.disc_start, cfg.disc_factor, 0.0
            )
            loss = nll + cfg.kl_weight * kl + d_weight * disc_factor * g_loss
            metrics = {
                "ae_loss": loss, "nll": nll, "kl": kl, "g_loss": g_loss,
                "d_weight": d_weight, "logvar": logvar,
                "rec_loss": jnp.mean(jnp.abs(x - rec)),
            }
            return loss, metrics

        (loss, metrics), (grads, logvar_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(vae_state.params, logvar)
        if cfg.decoder_only:
            # zero encoder grads (decoder-only finetune, autoencoder.py:52)
            def mask(path_keys, g):
                keys = [getattr(k, "key", str(k)) for k in path_keys]
                return jnp.zeros_like(g) if "encoder" in keys else g

            grads = jax.tree_util.tree_map_with_path(mask, grads)
        new_state = vae_state.apply_gradients(grads)
        new_logvar = logvar - 1e-4 * logvar_grad  # simple SGD on the scalar
        return new_state, new_logvar, metrics

    def disc_step(disc_state: TrainState, vae_params, batch, rng):
        x = batch["image"]

        def loss_fn(dparams):
            rec, _ = _reconstruct(vae_params, x, rng)
            rec = jax.lax.stop_gradient(rec)
            logits_real = disc_apply(dparams, x)
            logits_fake = disc_apply(dparams, rec)
            disc_factor = jnp.where(
                disc_state.step + 1 >= cfg.disc_start, cfg.disc_factor, 0.0
            )
            loss = disc_factor * d_loss_fn(logits_real, logits_fake)
            return loss, {
                "disc_loss": loss,
                "logits_real": jnp.mean(logits_real),
                "logits_fake": jnp.mean(logits_fake),
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc_state.params
        )
        return disc_state.apply_gradients(grads), metrics

    return jax.jit(ae_step, donate_argnums=(0,)), jax.jit(
        disc_step, donate_argnums=(0,)
    )
