"""Reverse-diffusion samplers compiled as single ``lax.scan`` loops.

Replaces the reference's python-loop samplers — ancestral p_sample_loop
(training_project/utils/gaussian_diffusion.py:344-430), DDIM
(gaussian_diffusion.py:620-789 and ldm/models/diffusion/ddim.py:128-261), and
DPM-Solver++ multistep (Disc_diff/guided_diffusion/sampler.py:305-900,
ldm/models/diffusion/dpm_solver_new/) — with branch-free scan bodies: the
denoiser is traced once and XLA pipelines the whole timestep chain on-device.
Per-step coefficients are precomputed host-side into [N]-tables indexed by the
scan counter, so there is no data-dependent control flow.

Classifier-free guidance is composed by wrapping ``denoise_fn``; conditioning
is closed over by the caller (the trainer passes ``lambda x, t: model(x, t,
cond)``), matching the reference's model_kwargs plumbing.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import process
from .schedules import DiffusionSchedule

__all__ = [
    "DenoiseFn",
    "cfg_wrap",
    "p_sample_loop",
    "ddim_sample_loop",
    "dpmpp_2m_sample_loop",
    "ddim_reverse_loop",
    "plms_sample_loop",
    "dynamic_threshold",
    "make_sampler",
]

# denoise_fn(x_t [B,H,W,C], t_model [B] float) -> raw model output
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def cfg_wrap(
    cond_fn: DenoiseFn, uncond_fn: DenoiseFn, guidance_scale: float
) -> DenoiseFn:
    """Classifier-free guidance: eps = u + s * (c - u).

    Reference ddim.py:206-218 / dpm_solver wrappers. One fused call site; for
    batched-CFG the caller can instead stack cond/uncond in the batch axis.
    """

    def fn(x, t):
        c = cond_fn(x, t)
        u = uncond_fn(x, t)
        return u + guidance_scale * (c - u)

    return fn


class _Loop(NamedTuple):
    x: jnp.ndarray
    rng: jax.Array


def _model_pred(sched, denoise_fn, x, t, parameterization, learn_sigma,
                clip_denoised, variance_type="fixed_small"):
    """One denoiser call -> (pred_x0, eps) pair used by all samplers."""
    B = x.shape[0]
    tb = jnp.full((B,), t, dtype=jnp.int32)
    t_model = process.model_timestep(sched, tb)
    out = denoise_fn(x, t_model)
    pmv = process.p_mean_variance(
        sched, out, x, tb, parameterization, learn_sigma, clip_denoised,
        variance_type=variance_type,
    )
    return pmv


def p_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = True,
    collect_x0: bool = False,
    variance_type: str = "fixed_small",
    guidance_fn: DenoiseFn | None = None,
):
    """Ancestral DDPM sampling (reference gaussian_diffusion.py:344-430).

    ``guidance_fn(x, t_model) -> grad log p(y|x)`` enables classifier
    guidance via the reference's ``condition_mean`` (:386-398):
    mean += variance * grad. Build the gradient with
    :func:`dsdiff_tpu.models.encoder_unet.classifier_gradient`.
    """
    T = sched.num_timesteps

    def body(carry: _Loop, i):
        t = T - 1 - i
        rng, key = jax.random.split(carry.rng)
        pmv = _model_pred(
            sched, denoise_fn, carry.x, t, parameterization, learn_sigma,
            clip_denoised, variance_type,
        )
        if guidance_fn is not None:
            B = carry.x.shape[0]
            tb = jnp.full((B,), t, dtype=jnp.int32)
            grad = guidance_fn(carry.x, process.model_timestep(sched, tb))
            pmv = pmv._replace(mean=pmv.mean + pmv.variance * grad)
        noise = jax.random.normal(key, carry.x.shape, carry.x.dtype)
        nonzero = jnp.float32(t != 0)
        x = pmv.mean + nonzero * jnp.exp(0.5 * pmv.log_variance) * noise
        out = pmv.pred_x0 if collect_x0 else None
        return _Loop(x, rng), out

    (final, _), x0s = jax.lax.scan(body, _Loop(x_T, rng), jnp.arange(T))
    return (final, x0s) if collect_x0 else final


def _ddim_tables(sched: DiffusionSchedule, eta: float):
    """Per-step DDIM coefficients over the (already re-spaced) schedule."""
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    acp_prev = np.asarray(sched.alphas_cumprod_prev, dtype=np.float64)
    sigma = eta * np.sqrt((1 - acp_prev) / (1 - acp)) * np.sqrt(1 - acp / acp_prev)
    dir_coef = np.sqrt(np.clip(1.0 - acp_prev - sigma**2, 0.0, None))
    return (
        jnp.asarray(np.sqrt(acp_prev), jnp.float32),
        jnp.asarray(dir_coef, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
    )


def ddim_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = True,
    eta: float = 0.0,
    collect_x0: bool = False,
    guidance_fn: DenoiseFn | None = None,
):
    """DDIM (eq. 12) over a re-spaced schedule.

    Reference gaussian_diffusion.py:620-789 / ddim.py:188-261, including the
    eta-sigma term and v-param support. ``sched`` should be the re-spaced
    schedule from :func:`dsdiff_tpu.core.schedules.respace`.

    ``guidance_fn(x, t_model) -> grad log p(y|x)`` applies the reference's
    ``condition_score`` (:400-421): eps' = eps - sqrt(1-acp_t) * grad, with
    pred_x0 re-derived from the rescored eps.
    """
    T = sched.num_timesteps
    sqrt_acp_prev, dir_coef, sigma_t = _ddim_tables(sched, eta)
    stochastic = eta != 0.0  # static: eta=0 needs no per-step noise at all

    def body(carry: _Loop, i):
        t = T - 1 - i
        rng = carry.rng
        pmv = _model_pred(
            sched, denoise_fn, carry.x, t, parameterization, learn_sigma,
            clip_denoised,
        )
        if guidance_fn is not None:
            B = carry.x.shape[0]
            tb = jnp.full((B,), t, dtype=jnp.int32)
            grad = guidance_fn(carry.x, process.model_timestep(sched, tb))
            eps = pmv.eps - jnp.sqrt(
                1.0 - sched.alphas_cumprod[t]
            ) * grad
            pred_x0 = process.predict_x0_from_eps(
                sched, carry.x, tb, eps
            )
            if clip_denoised:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            pmv = pmv._replace(eps=eps, pred_x0=pred_x0)
        eps_used = pmv.eps
        if clip_denoised:
            # reference ddim_sample (gaussian_diffusion.py:620-668)
            # re-derives eps from the CLIPPED pred_xstart, so the update
            # stays consistent when the clip binds — without this, strong
            # classifier guidance overshoots: pred_x0 saturates at +1 while
            # the raw rescored eps (unbounded) drags the dir_coef term the
            # opposite way, and the chain diverges from the guided class.
            tb = jnp.full((carry.x.shape[0],), t, dtype=jnp.int32)
            eps_used = process.predict_eps_from_x0(
                sched, carry.x, tb, pmv.pred_x0
            )
        x = sqrt_acp_prev[t] * pmv.pred_x0 + dir_coef[t] * eps_used
        if stochastic:
            rng, key = jax.random.split(rng)
            noise = jax.random.normal(key, carry.x.shape, carry.x.dtype)
            x = x + jnp.float32(t != 0) * sigma_t[t] * noise
        out = pmv.pred_x0 if collect_x0 else None
        return _Loop(x, rng), out

    (final, _), x0s = jax.lax.scan(body, _Loop(x_T, rng), jnp.arange(T))
    return (final, x0s) if collect_x0 else final


def ddim_reverse_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x_0: jnp.ndarray,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = False,
):
    """Deterministic DDIM inversion x_0 -> x_T (reference
    gaussian_diffusion.py ddim_reverse_sample / ddim.py stochastic_encode's
    deterministic sibling)."""
    T = sched.num_timesteps
    acp_next = sched.alphas_cumprod_next

    def body(x, t):
        pmv = _model_pred(
            sched, denoise_fn, x, t, parameterization, learn_sigma,
            clip_denoised,
        )
        # eps re-derived with the *next* alpha bar
        x_next = (
            jnp.sqrt(acp_next[t]) * pmv.pred_x0
            + jnp.sqrt(1.0 - acp_next[t]) * pmv.eps
        )
        return x_next, None

    final, _ = jax.lax.scan(body, x_0, jnp.arange(T))
    return final


def _dpmpp_tables(sched: DiffusionSchedule):
    """lambda/alpha/sigma tables over the re-spaced steps, ordered from t=T-1
    down to t=0 as the scan visits them, plus the r ratio per step."""
    acp = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    # visiting order: indices T-1 ... 0
    acp_vis = acp[::-1]
    alpha = np.sqrt(acp_vis)
    sigma = np.sqrt(1.0 - acp_vis)
    lam = np.log(alpha) - np.log(sigma)
    h = np.diff(lam)  # h[i] = lam_{i+1} - lam_i, i over update steps
    return (
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(sigma, jnp.float32),
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(h, jnp.float32),
    )


def dpmpp_2m_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = True,
):
    """DPM-Solver++(2M), data-prediction multistep order 2.

    TPU-native re-design of the reference's multistep solver
    (Disc_diff/guided_diffusion/sampler.py:305-900 'dpmsolver++' multistep,
    order 2): the lambda/h tables are precomputed, the predictor-corrector
    carry holds the previous x0 prediction, and the first step degenerates to
    first order via a where-mask instead of a python branch.

    Update (Lu et al. 2022, eq. DPM-Solver++(2M)):
        r_i = h_{i-1} / h_i
        D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}
        x_{i+1} = (sigma_{i+1}/sigma_i) x_i - alpha_{i+1} (e^{-h_i} - 1) D_i
    """
    T = sched.num_timesteps
    alpha_v, sigma_v, _, h_v = _dpmpp_tables(sched)

    class Carry(NamedTuple):
        x: jnp.ndarray
        prev_x0: jnp.ndarray
        prev_h: jnp.ndarray

    def body(carry: Carry, i):
        # visiting index i corresponds to schedule index t = T-1-i;
        # this model call is at t, the update moves to t-1 (visit index i+1).
        t = T - 1 - i
        pmv = _model_pred(
            sched, denoise_fn, carry.x, t, parameterization, learn_sigma,
            clip_denoised,
        )
        x0 = pmv.pred_x0
        h = h_v[i]
        r = carry.prev_h / h
        D_second = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * carry.prev_x0
        D = jnp.where(i == 0, x0, D_second)
        x_next = (sigma_v[i + 1] / sigma_v[i]) * carry.x - alpha_v[i + 1] * (
            jnp.exp(-h) - 1.0
        ) * D
        return Carry(x_next, x0, h), None

    # The final visit (i = T-1, t = 0) has no further step: run T-1 updates,
    # then a last first-order denoise to x0.
    init = Carry(x_T, jnp.zeros_like(x_T), jnp.ones(()))
    carry, _ = jax.lax.scan(body, init, jnp.arange(T - 1))
    pmv = _model_pred(
        sched, denoise_fn, carry.x, 0, parameterization, learn_sigma,
        clip_denoised,
    )
    return pmv.pred_x0


def dynamic_threshold(x0: jnp.ndarray, ratio: float = 0.995,
                      max_value: float = 1.0) -> jnp.ndarray:
    """Imagen-style dynamic thresholding of the x0 prediction.

    Reference Disc_diff/guided_diffusion/sampler.py:379-403
    (correcting_x0_fn='dynamic_thresholding', ratio 0.995): per-sample
    s = max(quantile(|x0|, ratio), max_value); clip to [-s, s] and rescale.
    Use as ``denoised_fn`` with clip_denoised=False.
    """
    B = x0.shape[0]
    flat = jnp.abs(x0.reshape(B, -1))
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.maximum(s, max_value).reshape(B, *([1] * (x0.ndim - 1)))
    return jnp.clip(x0, -s, s) / s * max_value


def plms_sample_loop(
    sched: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    parameterization: str = "eps",
    learn_sigma: bool = False,
    clip_denoised: bool = True,
):
    """PLMS (pseudo linear multistep, Liu et al. 2022).

    Re-design of reference ldm/models/diffusion/plms.py:118-244: 4th-order
    Adams-Bashforth over eps predictions with the pseudo-improved-Euler
    first step (second model eval at the midpoint). The first step runs
    unrolled (it needs two model calls); the remaining steps run as a
    ``lax.scan`` carrying the eps history ring, with where-masked 1st/2nd/
    3rd-order fallbacks while the history fills.
    """
    T = sched.num_timesteps
    sqrt_acp_prev, dir_coef, _ = _ddim_tables(sched, eta=0.0)
    acp = sched.alphas_cumprod

    def x_prev_from_eps(x, t, eps):
        """DDIM eta=0 update using a given eps (plms get_x_prev_and_pred_x0)."""
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        x0 = process.predict_x0_from_eps(sched, x, tb, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = process.predict_eps_from_x0(sched, x, tb, x0)
        return sqrt_acp_prev[t] * x0 + dir_coef[t] * eps

    def eps_at(x, t):
        pmv = _model_pred(sched, denoise_fn, x, t, parameterization,
                          learn_sigma, clip_denoised)
        return pmv.eps

    # ---- first step: pseudo improved Euler (plms.py:225-231)
    x = x_T
    t0 = T - 1
    e_t = eps_at(x, t0)
    x_prev_guess = x_prev_from_eps(x, t0, e_t)
    e_t_next = eps_at(x_prev_guess, max(t0 - 1, 0))
    e_prime = (e_t + e_t_next) / 2.0
    x = x_prev_from_eps(x, t0, e_prime)
    hist0 = jnp.stack([e_t, e_t, e_t, e_t])

    class Carry(NamedTuple):
        x: jnp.ndarray
        hist: jnp.ndarray  # [4, ...] most-recent-first
        n: jnp.ndarray     # history count

    def body(carry: Carry, i):
        t = T - 2 - i
        e_t = eps_at(carry.x, t)
        h = carry.hist
        # Adams-Bashforth orders 2..4 (plms.py:233-240)
        e2 = (3.0 * e_t - h[0]) / 2.0
        e3 = (23.0 * e_t - 16.0 * h[0] + 5.0 * h[1]) / 12.0
        e4 = (55.0 * e_t - 59.0 * h[0] + 37.0 * h[1] - 9.0 * h[2]) / 24.0
        e_prime = jnp.where(
            carry.n >= 3, e4, jnp.where(carry.n == 2, e3, e2)
        )
        x = x_prev_from_eps(carry.x, t, e_prime)
        hist = jnp.stack([e_t, h[0], h[1], h[2]])
        return Carry(x, hist, jnp.minimum(carry.n + 1, 3)), None

    if T > 1:
        carry, _ = jax.lax.scan(
            body, Carry(x, hist0, jnp.asarray(1)), jnp.arange(T - 1)
        )
        x = carry.x
    return x


def make_sampler(name: str):
    """Sampler registry keyed like the reference's ``sampler_setting.sampler``
    ('ddim' | 'plms' | 'dpm++' | 'ancestral'/'ddpm')."""
    table = {
        "ddim": ddim_sample_loop,
        "plms": plms_sample_loop,
        "dpm++": dpmpp_2m_sample_loop,
        "dpm_solver++": dpmpp_2m_sample_loop,
        "ancestral": p_sample_loop,
        "ddpm": p_sample_loop,
    }
    if name not in table:
        raise ValueError(f"unknown sampler '{name}' (have {sorted(table)})")
    return table[name]
