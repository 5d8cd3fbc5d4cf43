"""Diffusion noise schedules and timestep re-spacing.

TPU-native re-design of the reference's schedule machinery:

- ``make_beta_schedule`` covers the LDM schedule names
  (reference: ldm/modules/diffusionmodules/util.py:21-50) plus the OpenAI
  ``get_named_beta_schedule`` linear/cosine forms
  (reference: training_project/utils/gaussian_diffusion.py:33-67).
- ``DiffusionSchedule`` replaces both the LDM registered-buffer tables
  (reference: ldm/models/diffusion/ddpm.py:138-192) and the OpenAI numpy
  tables (reference: training_project/utils/gaussian_diffusion.py:144-181)
  with a single immutable pytree of f32 arrays, computed once in float64 on
  the host and closed over by jitted functions. Nothing here is traced —
  XLA constant-folds the gathers.
- ``space_timesteps`` / ``respace`` reproduce the subsequence re-spacing of
  reference: training_project/utils/respace.py:7-45 (SpacedDiffusion), with
  the timestep remap carried as an explicit ``timestep_map`` array instead
  of a model wrapper class.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "DiffusionSchedule",
    "space_timesteps",
    "respace",
]


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
    max_beta: float = 0.999,
) -> np.ndarray:
    """Return the beta table for a named schedule, float64, shape [T].

    Names: ``linear`` (sqrt-space interpolation, the SD/LDM default, also what
    the OpenAI fork calls ``linear`` after scaling), ``scaled_linear`` (OpenAI
    linear with the 1000/T scaling), ``cosine`` (Nichol-Dhariwal alpha-bar
    cosine), ``sqrt_linear``, ``sqrt``.
    """
    if schedule == "linear":
        # reference ldm/modules/diffusionmodules/util.py:30-33
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "scaled_linear":
        # reference training_project/utils/gaussian_diffusion.py:43-49
        scale = 1000.0 / n_timestep
        betas = np.linspace(
            scale * 0.0001, scale * 0.02, n_timestep, dtype=np.float64
        )
        # the 1000/T scaling pushes beta past 1 for T < ~21, where
        # alpha = 1-beta <= 0 makes every downstream sqrt/log NaN; clamp
        # to max_beta as the cosine branch does (identical for all
        # production T — beta_end = 20/T < 0.999 whenever T > 20)
        betas = np.clip(betas, 0.0, max_beta)
    elif schedule == "cosine":
        # reference training_project/utils/gaussian_diffusion.py:52-67 and
        # ldm/modules/diffusionmodules/util.py:35-43
        def alpha_bar(t):
            return math.cos((t + cosine_s) / (1 + cosine_s) * math.pi / 2) ** 2

        betas = []
        for i in range(n_timestep):
            t1 = i / n_timestep
            t2 = (i + 1) / n_timestep
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
        betas = np.asarray(betas, dtype=np.float64)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = (
            np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
        )
    else:
        raise ValueError(f"unknown beta schedule '{schedule}'")
    assert betas.shape == (n_timestep,)
    return betas


class DiffusionSchedule(NamedTuple):
    """All derived q/p tables, shape [T] each (f32 on device).

    Mirrors the buffer set of reference ldm/models/diffusion/ddpm.py:155-176
    and the numpy tables of training_project/utils/gaussian_diffusion.py:150-181.
    ``timestep_map`` maps re-spaced indices back to original model timesteps
    (identity for a full schedule); ``rescale_factor`` implements
    ``rescale_timesteps`` (reference respace.py:120-124): the model is called
    with ``timestep_map[t] * rescale_factor``.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 [T]
    rescale_factor: jnp.ndarray  # f32 scalar

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        timestep_map: np.ndarray | None = None,
        rescale_timesteps: bool = False,
        original_num_steps: int | None = None,
    ) -> "DiffusionSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        T = betas.shape[0]
        alphas = 1.0 - betas
        acp = np.cumprod(alphas, axis=0)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        # log-variance clipped at t=0 as in the reference
        # (gaussian_diffusion.py:170-173 / ddpm.py:170-173); a single-step
        # schedule has no t=1 to borrow from — floor it instead
        if T > 1:
            post_logvar = np.log(np.append(post_var[1], post_var[1:]))
        else:
            post_logvar = np.log(np.maximum(post_var, 1e-20))
        if timestep_map is None:
            timestep_map = np.arange(T, dtype=np.int32)
        orig = original_num_steps if original_num_steps is not None else T
        rescale = (1000.0 / orig) if rescale_timesteps else 1.0
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            alphas_cumprod_next=f32(acp_next),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(post_var),
            posterior_log_variance_clipped=f32(post_logvar),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32(
                (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)
            ),
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
            rescale_factor=jnp.asarray(rescale, dtype=jnp.float32),
        )

    @classmethod
    def named(
        cls,
        schedule: str = "linear",
        num_timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
    ) -> "DiffusionSchedule":
        return cls.create(
            make_beta_schedule(
                schedule, num_timesteps, linear_start, linear_end, cosine_s
            )
        )


def space_timesteps(num_timesteps: int, section_counts: str | Sequence[int]):
    """Pick a subsequence of original timesteps to retain.

    Faithful to reference training_project/utils/respace.py:7-45: supports
    ``"ddimN"`` (fixed-stride DDIM spacing) and comma-separated per-section
    counts (e.g. ``"20"`` or ``"10,15,25"``). Returns a sorted python list.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim") :])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return sorted(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return sorted(all_steps)


def respace(
    full_betas: np.ndarray,
    use_timesteps: Sequence[int],
    rescale_timesteps: bool = False,
) -> DiffusionSchedule:
    """Build the re-spaced schedule over ``use_timesteps``.

    Reproduces SpacedDiffusion's beta re-derivation
    (reference training_project/utils/respace.py:63-78): the retained steps'
    cumulative alpha products are preserved and new betas are solved from
    consecutive ratios.
    """
    full_betas = np.asarray(full_betas, dtype=np.float64)
    acp = np.cumprod(1.0 - full_betas)
    use = sorted(int(t) for t in use_timesteps)
    last_alpha_cumprod = 1.0
    new_betas = []
    for t in use:
        new_betas.append(1.0 - acp[t] / last_alpha_cumprod)
        last_alpha_cumprod = acp[t]
    return DiffusionSchedule.create(
        np.asarray(new_betas),
        timestep_map=np.asarray(use, dtype=np.int32),
        rescale_timesteps=rescale_timesteps,
        original_num_steps=full_betas.shape[0],
    )
