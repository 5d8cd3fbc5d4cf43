"""Jitted train / validation-sample steps over the device mesh.

This is the TPU replacement for the whole Lightning training_step +
backward + optimizer + EMA chain (trainers/trainer_use_gaussian_diff.py:
446-502) and the predict-time sampler dispatch (:586-623): one donated,
GSPMD-sharded jit per phase. Design points:

- conditioning is 'concat' (the DS-Diff mode): x_t gets the condition
  channels appended before the denoiser call (ddpm.py:1331-1333),
- the schedule-sampler state update happens inside the step (global arrays;
  XLA inserts any cross-chip reduction),
- disentangle losses (DS C-S / S-A-L, DisC com/dist) are computed from the
  model's feature dict and added with their lambdas
  (trainer_use_gaussian_diff.py:466-470, Disc gaussian_diffusion.py:898-916),
- bf16 compute happens inside the model (dtype attr); master params, loss
  and optimizer state stay f32 — the TPU-native version of
  MixedPrecisionTrainer (fp16_util.py:34-80), with no loss-scaling needed
  for bf16,
- batches arrive sharded over the mesh 'data' axis; params/EMA replicated
  (or 'fsdp'-sharded via parallel.mesh.param_sharding).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..core import losses as L
from ..core import process, sampling
from ..core.schedules import DiffusionSchedule
from . import schedule_sampler as ss
from .state import TrainState

__all__ = ["TaskConfig", "make_train_step", "make_sample_fn", "make_val_metrics"]


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Static per-run knobs (hashable: safe to close over in jit)."""

    parameterization: str = "v"
    loss_type: str = "charbonnier"
    learn_sigma: bool = False
    # ancestral-sampling variance when learn_sigma is False: 'fixed_small'
    # (LDM posterior) or 'fixed_large' (OpenAI sigma_small=False default)
    variance_type: str = "fixed_small"
    vlb_weight: float = 1.0
    # 'ds' (C-S + S-A-L), 'disc' (com/dist), or None
    feature_kind: str | None = None
    disentangle_mode: str = "eu"  # eu | contrast | eu&contrast
    disen_lambda: float = 0.5
    disen_temperature: float = 0.05
    elbo_lambda: float = 0.0  # extra VLB weighting (trainer_ds_diff 'elbo_w')
    # classifier-free guidance: train-time condition dropout probability and
    # inference guidance scale (1.0 = no guidance)
    cond_dropout: float = 0.0
    cfg_scale: float = 1.0


def _denoiser(apply_fn: Callable, params, cond: jnp.ndarray | None,
              train: bool, rngs=None):
    """concat-conditioned denoiser closure: (x_t, t_model) -> raw output."""

    def fn(x, t_model):
        xin = x if cond is None else jnp.concatenate([x, cond], axis=-1)
        kwargs = {}
        if rngs is not None:
            kwargs["rngs"] = rngs
        if train:
            kwargs["deterministic"] = False
        return apply_fn(params, xin, t_model, **kwargs)

    return fn


def make_train_step(
    task: TaskConfig,
    sched: DiffusionSchedule,
    donate: bool = True,
):
    """Returns jitted (state, sampler_state, batch, rng) ->
    (state, sampler_state, metrics)."""

    def step(state: TrainState, sampler_state, batch, rng):
        x0 = batch["target"]
        cond = batch["image"]
        B = x0.shape[0]
        rng = jax.random.fold_in(rng, state.step)
        t_rng, n_rng, d_rng, c_rng = jax.random.split(rng, 4)
        t, weights = ss.sample_t(sampler_state, t_rng, B)
        noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
        if task.cond_dropout > 0:
            keep = (
                jax.random.uniform(c_rng, (B, 1, 1, 1)) >= task.cond_dropout
            ).astype(cond.dtype)
            cond = cond * keep

        def loss_fn(params):
            model_fn = _denoiser(
                state.apply_fn, params, cond, train=True,
                rngs={"dropout": d_rng},
            )
            terms, feats = process.training_losses(
                sched, model_fn, x0, t, noise,
                parameterization=task.parameterization,
                loss_type=task.loss_type,
                learn_sigma=task.learn_sigma,
                vlb_weight=task.vlb_weight,
                elbo_weight=task.elbo_lambda,
            )
            loss = jnp.mean(weights * terms["loss"])
            metrics = {
                "loss_simple": jnp.mean(terms["mse"]),
            }
            if "vb" in terms:
                metrics["loss_vlb"] = jnp.mean(terms["vb"])
            if task.feature_kind == "ds" and feats is not None:
                cs, sal, _ = L.ds_disentangle_losses(
                    feats, task.disentangle_mode, task.disen_temperature
                )
                loss = loss + task.disen_lambda * (cs + sal)
                metrics["loss_disen_cs"] = cs
                metrics["loss_disen_sal"] = sal
            elif task.feature_kind == "disc" and feats is not None:
                disen = L.disc_disentangle_loss(feats)
                loss = loss + task.disen_lambda * disen
                metrics["loss_disen"] = disen
            metrics["loss"] = loss
            return loss, (terms["loss"], metrics)

        (loss, (per_elem, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        new_sampler = ss.update_state(
            sampler_state, t, jax.lax.stop_gradient(per_elem)
        )
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree.leaves(grads))
        )
        return new_state, new_sampler, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_sample_fn(
    apply_fn: Callable,
    sched: DiffusionSchedule,
    task: TaskConfig,
    sampler: str = "ddim",
    eta: float = 0.0,
    clip_denoised: bool = True,
    out_channels: int = 1,
    full_sched: DiffusionSchedule | None = None,
    sample_steps: int | None = None,
    solver_options: dict | None = None,
    patch_params: dict | None = None,
):
    """Returns jitted (params, cond, rng) -> samples [B, H, W, C].

    ``sched`` should already be re-spaced to the inference step count
    (on_predict_start parity, trainer_use_gaussian_diff.py:586-600). The
    whole reverse chain compiles to one lax.scan — the reference's hot loop
    (2) in SURVEY.md §3.

    The 'dpm'/'dpm_solver' samplers are the full DPM-Solver family
    (core.dpm_solver; reference sampler.py:305-1273 via
    gaussian_diffusion.py:467-523): they need ``full_sched`` (the un-respaced
    schedule — the solver re-grids internally) and ``sample_steps``;
    ``solver_options`` forwards order/method/skip_type/algorithm_type.
    """

    def fn(params, cond, rng):
        B, H, W, _ = cond.shape
        out_ch = out_channels
        x_rng, loop_rng = jax.random.split(rng)
        x_T = jax.random.normal(x_rng, (B, H, W, out_ch), jnp.float32)

        def make_denoise(c):
            if patch_params:
                # fold/unfold split-input mode (ddpm.py:857-927): one
                # batched model call over all overlapping tiles
                from ..core import patching

                ks = tuple(patch_params.get("ks", (64, 64)))
                stride = tuple(patch_params.get("stride", ks))
                wkeys = ("clip_min_weight", "clip_max_weight", "tie_braker",
                         "clip_min_tie_weight", "clip_max_tie_weight")
                wparams = {k: patch_params[k] for k in wkeys
                           if k in patch_params}

                def tile_fn(xin, t_tiles):
                    out = apply_fn(params, xin, t_tiles)
                    return out[0] if isinstance(out, tuple) else out

                def denoise(x, t_model):
                    return patching.patched_apply(
                        tile_fn, x, t_model, ks, stride, cond=c, **wparams
                    )

                return denoise

            raw = _denoiser(apply_fn, params, c, train=False)

            def denoise(x, t_model):
                out = raw(x, t_model)
                # feature models (DSUNet/DiscUNet) yield (out, aux)
                return out[0] if isinstance(out, tuple) else out

            return denoise

        denoise_cond = make_denoise(cond)
        if task.cfg_scale != 1.0:
            denoise = sampling.cfg_wrap(
                denoise_cond, make_denoise(jnp.zeros_like(cond)),
                task.cfg_scale,
            )
        else:
            denoise = denoise_cond
        common = dict(
            parameterization=task.parameterization,
            learn_sigma=task.learn_sigma,
            clip_denoised=clip_denoised,
        )
        if sampler in ("dpm", "dpm_solver", "dpm_singlestep",
                       "dpm_adaptive"):
            from ..core import dpm_solver as DS

            opts = dict(solver_options or {})
            if sampler == "dpm_singlestep":
                opts.setdefault("method", "singlestep")
                opts.setdefault("order", 3)
                opts.setdefault("skip_type", "time_uniform")
                opts.setdefault("denoised_fn", None)
            elif sampler == "dpm_adaptive":
                opts.setdefault("method", "adaptive")
                opts.setdefault("order", 3)
                opts.setdefault("denoised_fn", None)
            return DS.dpm_solver_sample_loop(
                full_sched if full_sched is not None else sched,
                denoise, x_T, steps=sample_steps,
                parameterization=task.parameterization,
                learn_sigma=task.learn_sigma,
                clip_denoised=False, **opts,
            )
        if sampler in ("ddim",):
            return sampling.ddim_sample_loop(
                sched, denoise, x_T, loop_rng, eta=eta, **common
            )
        if sampler in ("dpm++", "dpm_solver++"):
            return sampling.dpmpp_2m_sample_loop(
                sched, denoise, x_T, **common
            )
        if sampler == "plms":
            return sampling.plms_sample_loop(sched, denoise, x_T, **common)
        if sampler in ("ancestral", "ddpm"):
            return sampling.p_sample_loop(
                sched, denoise, x_T, loop_rng,
                variance_type=task.variance_type, **common
            )
        raise ValueError(f"unknown sampler '{sampler}'")

    return jax.jit(fn)


def make_val_metrics():
    """Jitted per-batch SSIM/MAE validation metrics (the reference computes
    MONAI SSIM+MAE per val batch, trainer_ds_diff.py:798-823)."""
    from ..eval import metrics as M

    def fn(pred, target, valid):
        p = pred[..., 0]
        t = target[..., 0]
        ssim = M.ssim(t, p, data_range=2.0)
        mae = jnp.mean(jnp.abs(p - t), axis=(1, 2))
        mse = jnp.mean((p - t) ** 2, axis=(1, 2))
        psnr = 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))  # range 2.0
        w = valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        return {
            "ssim": (ssim * w).sum() / denom,
            "mae": (mae * w).sum() / denom,
            "psnr": (psnr * w).sum() / denom,
        }

    return jax.jit(fn)
