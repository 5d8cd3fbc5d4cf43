"""The Gaussian diffusion process as pure, jit-fusable functions.

This single module replaces the reference's four duplicated diffusion stacks
(ldm/models/diffusion/ddpm.py:47-524, training_project/utils/
gaussian_diffusion.py:113-983, Disc_diff/guided_diffusion/
gaussian_diffusion.py:111-920, and the respace wrappers): one set of pure
functions over a :class:`~dsdiff_tpu.core.schedules.DiffusionSchedule` pytree,
covering eps / x0 / v parameterizations, fixed and learned variance, l1 / l2 /
charbonnier regression, and the VLB term.

TPU design notes: all per-timestep coefficients are gathers from [T] tables
that XLA keeps resident in HBM and fuses with the elementwise math; ``t`` is a
[B] int32 array; everything is batched and static-shaped so the whole loss
lands in one fused kernel around the denoiser call.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .losses import (
    charbonnier,
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)
from .schedules import DiffusionSchedule

__all__ = [
    "extract",
    "model_timestep",
    "q_mean_variance",
    "q_sample",
    "q_posterior_mean_variance",
    "predict_x0_from_eps",
    "predict_eps_from_x0",
    "predict_x0_from_v",
    "predict_eps_from_v",
    "get_v",
    "split_model_output",
    "learned_log_variance",
    "PMeanVariance",
    "p_mean_variance",
    "vb_terms_bpd",
    "training_losses",
    "lvlb_weights",
    "prior_bpd",
]

ModelFn = Callable[..., Any]


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather table[t] and reshape to [B, 1, 1, ...] for broadcasting.

    Reference _extract_into_tensor (gaussian_diffusion.py:986-1000) /
    extract_into_tensor (ldm/modules/diffusionmodules/util.py:103-106).
    """
    out = table[t].astype(jnp.float32)
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def model_timestep(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Map re-spaced step index -> original model timestep (float, rescaled).

    Replaces the _WrappedModel timestep remap of reference respace.py:109-124.
    """
    return sched.timestep_map[t].astype(jnp.float32) * sched.rescale_factor


def q_mean_variance(sched: DiffusionSchedule, x0, t):
    """Moments of q(x_t | x_0) (gaussian_diffusion.py:183-199)."""
    nd = x0.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x0
    variance = extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x0, t, noise):
    """Sample x_t ~ q(x_t | x_0) (gaussian_diffusion.py:201-223, ddpm.py:356)."""
    nd = x0.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x0
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: DiffusionSchedule, x0, xt, t):
    """Moments of q(x_{t-1} | x_t, x_0) (gaussian_diffusion.py:225-249)."""
    nd = x0.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x0
        + extract(sched.posterior_mean_coef2, t, nd) * xt
    )
    variance = extract(sched.posterior_variance, t, nd)
    log_variance = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


def predict_x0_from_eps(sched: DiffusionSchedule, xt, t, eps):
    nd = xt.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * xt
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_x0(sched: DiffusionSchedule, xt, t, x0):
    nd = xt.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * xt - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_x0_from_v(sched: DiffusionSchedule, xt, t, v):
    """v-parameterization x0 recovery (gaussian_diffusion.py:319-342,
    ddpm.py predict_start_from_z_and_v:368-377)."""
    nd = xt.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * xt
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


def predict_eps_from_v(sched: DiffusionSchedule, xt, t, v):
    nd = xt.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * v
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * xt
    )


def get_v(sched: DiffusionSchedule, x0, noise, t):
    """Target for v-parameterization (gaussian_diffusion.py:239-245,
    ddpm.py get_v:379-384)."""
    nd = x0.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * noise
        - extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x0
    )


def split_model_output(model_output: jnp.ndarray, x_channels: int):
    """Split a learned-sigma output [B, 2C, ...] / [B, ..., 2C] is NOT handled;
    we use NHWC throughout, so split along the trailing channel axis."""
    pred, var_values = jnp.split(model_output, [x_channels], axis=-1)
    return pred, var_values


def learned_log_variance(sched: DiffusionSchedule, var_values, t):
    """Interpolated log-variance for LEARNED_RANGE models.

    Reference gaussian_diffusion.py:286-303: model emits v in [-1,1]; the
    log-variance interpolates between the clipped posterior floor and
    log(beta_t).
    """
    nd = var_values.ndim
    min_log = extract(sched.posterior_log_variance_clipped, t, nd)
    max_log = jnp.log(extract(sched.betas, t, nd))
    frac = (var_values + 1.0) / 2.0
    return frac * max_log + (1.0 - frac) * min_log


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_x0: jnp.ndarray
    eps: jnp.ndarray


def p_mean_variance(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = True,
    denoised_fn: Callable | None = None,
    variance_type: str = "fixed_small",
) -> PMeanVariance:
    """p(x_{t-1} | x_t) moments from a raw denoiser output.

    Covers reference gaussian_diffusion.py:251-342 for all
    ModelMeanType/ModelVarType combinations used by the repo (EPSILON /
    START_X / VELOCITY x FIXED_SMALL / FIXED_LARGE / LEARNED_RANGE).
    ``variance_type`` applies when ``learn_sigma`` is False: 'fixed_small'
    uses the q-posterior variance (the LDM DDPM default, ddpm.py:299-306);
    'fixed_large' uses beta_t with the t=0 entry patched to the posterior
    (reference gaussian_diffusion.py:271-280, the OpenAI
    create_gaussian_diffusion sigma_small=False default).
    """
    C = xt.shape[-1]
    if learn_sigma:
        pred, var_values = split_model_output(model_output, C)
        log_variance = learned_log_variance(sched, var_values, t)
        variance = jnp.exp(log_variance)
    elif variance_type == "fixed_large":
        pred = model_output
        T = sched.betas.shape[0]
        if T > 1:
            var_table = jnp.concatenate(
                [sched.posterior_variance[1:2], sched.betas[1:]]
            )
        else:
            var_table = sched.posterior_variance
        variance = extract(var_table, t, xt.ndim)
        log_variance = jnp.log(jnp.maximum(variance, 1e-20))
    else:
        pred = model_output
        _, variance, log_variance = q_posterior_mean_variance(sched, xt, xt, t)

    if parameterization == "eps":
        pred_x0 = predict_x0_from_eps(sched, xt, t, pred)
    elif parameterization == "x0":
        pred_x0 = pred
    elif parameterization == "v":
        pred_x0 = predict_x0_from_v(sched, xt, t, pred)
    else:
        raise ValueError(f"unknown parameterization {parameterization}")

    if denoised_fn is not None:
        pred_x0 = denoised_fn(pred_x0)
    if clip_denoised:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

    mean, _, _ = q_posterior_mean_variance(sched, pred_x0, xt, t)
    eps = predict_eps_from_x0(sched, xt, t, pred_x0)
    return PMeanVariance(mean, variance, log_variance, pred_x0, eps)


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    x0: jnp.ndarray,
    xt: jnp.ndarray,
    t: jnp.ndarray,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = True,
):
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits, with the t=0
    discretized decoder NLL (reference gaussian_diffusion.py:792-822)."""
    true_mean, _, true_logvar = q_posterior_mean_variance(sched, x0, xt, t)
    out = p_mean_variance(
        sched, model_output, xt, t, parameterization, learn_sigma, clip_denoised
    )
    kl = normal_kl(true_mean, true_logvar, out.mean, out.log_variance)
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x0, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return output, out.pred_x0


def training_losses(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    model_kwargs: dict | None = None,
    parameterization: str = "v",
    loss_type: str = "charbonnier",
    learn_sigma: bool = False,
    vlb_weight: float = 1.0,
    charbonnier_eps: float = 1e-3,
    elbo_weight: float = 0.0,
):
    """Per-batch-element diffusion training loss.

    Mirrors reference training_project/utils/gaussian_diffusion.py:824-983
    minus the disentangle terms (those live in the trainer, fed by the model's
    feature dict — see train/losses aggregation). ``model_fn`` is called as
    ``model_fn(x_t, t_model, **model_kwargs)`` and may return either an array
    or a tuple ``(array, aux)``; aux (feature dicts) is passed through.

    loss_type: 'l2' | 'l1' | 'charbonnier' | 'rescaled_mse' (adds the frozen-
    mean VB term when learn_sigma).
    Returns (terms: dict of [B] arrays, aux).
    """
    model_kwargs = model_kwargs or {}
    xt = q_sample(sched, x0, t, noise)
    t_model = model_timestep(sched, t)
    raw = model_fn(xt, t_model, **model_kwargs)
    if isinstance(raw, tuple):
        model_output, aux = raw
    else:
        model_output, aux = raw, None

    terms: dict[str, jnp.ndarray] = {}
    C = x0.shape[-1]
    if learn_sigma:
        pred, var_values = split_model_output(model_output, C)
        # Freeze the mean's contribution to the VB term as in reference
        # gaussian_diffusion.py:869-885 (detach applied to the mean half).
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(pred), var_values], axis=-1
        )
        vb, _ = vb_terms_bpd(
            sched, frozen, x0, xt, t, parameterization, learn_sigma=True
        )
        # rescale as in RESCALED_MSE (gaussian_diffusion.py:880-885)
        terms["vb"] = vb * (sched.num_timesteps / 1000.0) * vlb_weight
    else:
        pred = model_output

    if parameterization == "eps":
        target = noise
    elif parameterization == "x0":
        target = x0
    elif parameterization == "v":
        target = get_v(sched, x0, noise, t)
    else:
        raise ValueError(f"unknown parameterization {parameterization}")

    if loss_type in ("l2", "mse", "rescaled_mse"):
        terms["mse"] = mean_flat((target - pred) ** 2)
    elif loss_type == "l1":
        terms["mse"] = mean_flat(jnp.abs(target - pred))
    elif loss_type == "charbonnier":
        # reference gaussian_diffusion.py:905 uses charbonnier in place of mse
        terms["mse"] = mean_flat(charbonnier(pred, target, charbonnier_eps))
    else:
        raise ValueError(f"unknown loss_type {loss_type}")

    if elbo_weight > 0:
        # the LDM-math variant adds elbo_w * lvlb_weights[t] * loss_simple
        # (reference ddpm.py:186-192 lvlb_weights, trainer_ds_diff.py:606-614)
        lvlb_w = lvlb_weights(sched, parameterization)[t]
        terms["elbo"] = elbo_weight * lvlb_w * terms["mse"]
    terms["loss"] = (
        terms["mse"] + terms.get("vb", 0.0) + terms.get("elbo", 0.0)
    )
    return terms, aux


def lvlb_weights(sched: DiffusionSchedule,
                 parameterization: str = "eps") -> jnp.ndarray:
    """Per-timestep VLB weights (reference ddpm.py:180-192): for eps,
    beta^2 / (2 post_var alpha (1-acp)); for v, ones; t=0 copied from t=1."""
    if parameterization == "v":
        return jnp.ones_like(sched.betas)
    alphas = 1.0 - sched.betas
    w = sched.betas**2 / (
        2.0 * sched.posterior_variance * alphas
        * (1.0 - sched.alphas_cumprod)
    )
    return w.at[0].set(w[1])


def prior_bpd(sched: DiffusionSchedule, x0):
    """KL(q(x_T|x_0) || N(0,1)) in bits (gaussian_diffusion.py:769-790)."""
    B = x0.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    mean, _, log_variance = q_mean_variance(sched, x0, t)
    kl = normal_kl(mean, log_variance, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)
