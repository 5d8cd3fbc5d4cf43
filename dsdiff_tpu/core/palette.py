"""Palette/SR3-style gamma-conditioned diffusion variant.

Re-design of the reference's Palette formulation
(trainers/trainer_diffusion.py:330-575 — the schedule + sampler math is
complete there even though its UNet import is broken, SURVEY.md §7):

- the model is conditioned on the **noise level** gamma_t = prod(alpha)
  instead of the timestep index (:433-453), with separate train and test
  schedules (:186-199 — e.g. train 2000 steps 1e-6..0.01, test 1000 steps
  1e-4..0.09),
- q_sample / posterior math over the gamma tables (:330-357),
- ancestral and DDIM reverse loops over a uniform or quadratic timestep
  subsequence (:521-575), compiled here as ``lax.scan``.

The denoiser signature is ``model_fn(x_with_cond, gamma[B]) -> eps``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import make_beta_schedule

__all__ = [
    "GammaSchedule",
    "q_sample",
    "p_sample_loop",
    "ddim_sample_loop",
    "training_loss",
]


class GammaSchedule(NamedTuple):
    """gamma tables (trainer_diffusion.py:330-351)."""

    betas: jnp.ndarray
    gammas: jnp.ndarray
    gammas_prev: jnp.ndarray
    sqrt_recip_gammas: jnp.ndarray
    sqrt_recipm1_gammas: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(cls, schedule="linear", n_timestep=2000, linear_start=1e-6,
               linear_end=0.01) -> "GammaSchedule":
        betas = make_beta_schedule(
            schedule, n_timestep, linear_start, linear_end
        )
        alphas = 1.0 - betas
        gammas = np.cumprod(alphas)
        gammas_prev = np.append(1.0, gammas[:-1])
        post_var = betas * (1.0 - gammas_prev) / (1.0 - gammas)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            betas=f32(betas),
            gammas=f32(gammas),
            gammas_prev=f32(gammas_prev),
            sqrt_recip_gammas=f32(np.sqrt(1.0 / gammas)),
            sqrt_recipm1_gammas=f32(np.sqrt(1.0 / gammas - 1.0)),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(post_var, 1e-20))
            ),
            posterior_mean_coef1=f32(
                betas * np.sqrt(gammas_prev) / (1.0 - gammas)
            ),
            posterior_mean_coef2=f32(
                (1.0 - gammas_prev) * np.sqrt(alphas) / (1.0 - gammas)
            ),
        )


def q_sample(gamma, y0, noise):
    """y_t = sqrt(gamma) y0 + sqrt(1-gamma) eps (trainer_diffusion.py:422)."""
    g = gamma.reshape(-1, *([1] * (y0.ndim - 1)))
    return jnp.sqrt(g) * y0 + jnp.sqrt(1.0 - g) * noise


def training_loss(
    sched: GammaSchedule,
    model_fn: Callable,
    y0: jnp.ndarray,
    y_cond: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    mask: jnp.ndarray | None = None,
):
    """Gamma-conditioned eps loss (forward, trainer_diffusion.py:433-453);
    optional inpainting mask mixes the known region back in."""
    gamma = sched.gammas[t]
    y_noisy = q_sample(gamma, y0, noise)
    if mask is not None:
        y_in = y_noisy * mask + (1.0 - mask) * y0
        pred = model_fn(jnp.concatenate([y_cond, y_in], axis=-1), gamma)
        return jnp.mean((mask * (noise - pred)) ** 2)
    pred = model_fn(jnp.concatenate([y_cond, y_noisy], axis=-1), gamma)
    return jnp.mean((noise - pred) ** 2)


def _predict_x0(sched, y_t, t, noise):
    nd = y_t.ndim
    r = sched.sqrt_recip_gammas[t].reshape(-1, *([1] * (nd - 1)))
    rm1 = sched.sqrt_recipm1_gammas[t].reshape(-1, *([1] * (nd - 1)))
    return r * y_t - rm1 * noise


def p_sample_loop(
    sched: GammaSchedule,
    model_fn: Callable,
    y_cond: jnp.ndarray,
    rng: jax.Array,
    clip_denoised: bool = True,
):
    """Ancestral reverse loop (trainer_diffusion.py restoration, non-DDIM)."""
    T = sched.num_timesteps
    B = y_cond.shape[0]
    rng, init = jax.random.split(rng)
    y = jax.random.normal(init, y_cond.shape[:-1] + (1,), jnp.float32)

    def body(carry, i):
        y, rng = carry
        t = T - 1 - i
        tb = jnp.full((B,), t, jnp.int32)
        gamma = sched.gammas[tb]
        eps = model_fn(jnp.concatenate([y_cond, y], axis=-1), gamma)
        x0 = _predict_x0(sched, y, tb, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        nd = y.ndim
        c1 = sched.posterior_mean_coef1[tb].reshape(-1, *([1] * (nd - 1)))
        c2 = sched.posterior_mean_coef2[tb].reshape(-1, *([1] * (nd - 1)))
        logvar = sched.posterior_log_variance_clipped[tb].reshape(
            -1, *([1] * (nd - 1))
        )
        mean = c1 * x0 + c2 * y
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, y.shape, y.dtype)
        y = mean + jnp.float32(t != 0) * jnp.exp(0.5 * logvar) * z
        return (y, rng), None

    (y, _), _ = jax.lax.scan(body, (y, rng), jnp.arange(T))
    return y


def ddim_sample_loop(
    sched: GammaSchedule,
    model_fn: Callable,
    y_cond: jnp.ndarray,
    rng: jax.Array,
    ddim_steps: int = 50,
    eta: float = 0.0,
    method: str = "uniform",
    clip_denoised: bool = True,
):
    """Subsequence DDIM over gamma tables (trainer_diffusion.py:521-575),
    with the reference's +1 index shift and uniform/quad discretization."""
    T = sched.num_timesteps
    if method == "uniform":
        seq = np.arange(0, T, T // ddim_steps)
    elif method == "quad":
        seq = (np.linspace(0, np.sqrt(T * 0.8), ddim_steps) ** 2).astype(int)
    else:
        raise ValueError(f"unknown ddim discretization '{method}'")
    seq = np.clip(seq + 1, 0, T - 1)
    prev_seq = np.append([0], seq[:-1])
    g_t = jnp.asarray(np.asarray(sched.gammas)[seq])
    g_prev = jnp.asarray(np.asarray(sched.gammas)[prev_seq])

    B = y_cond.shape[0]
    rng, init = jax.random.split(rng)
    y = jax.random.normal(init, y_cond.shape[:-1] + (1,), jnp.float32)

    def body(carry, i):
        y, rng = carry
        idx = ddim_steps - 1 - i
        gamma = jnp.full((B,), g_t[idx])
        gp = g_prev[idx]
        eps = model_fn(jnp.concatenate([y_cond, y], axis=-1), gamma)
        g = g_t[idx]
        x0 = (y - jnp.sqrt(1.0 - g) * eps) / jnp.sqrt(g)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        sigma = eta * jnp.sqrt((1 - gp) / (1 - g) * (1 - g / gp))
        dir_xt = jnp.sqrt(jnp.clip(1.0 - gp - sigma**2, min=0.0)) * eps
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, y.shape, y.dtype)
        y = jnp.sqrt(gp) * x0 + dir_xt + sigma * z
        return (y, rng), None

    (y, _), _ = jax.lax.scan(body, (y, rng), jnp.arange(ddim_steps))
    return y
