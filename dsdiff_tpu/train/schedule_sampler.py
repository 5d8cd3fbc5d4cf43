"""Timestep schedule samplers: uniform and loss-second-moment importance.

Functional re-design of Disc_diff/guided_diffusion/resample.py:

- ``UniformSampler`` (:61-78): t ~ U[0, T), weights 1.
- ``LossSecondMomentResampler`` (:124-154): keeps a [T, history] loss buffer,
  samples t proportional to sqrt(E[loss^2]) with a uniform floor, weights
  1/(T p_t). The reference syncs per-rank losses with an explicit all_gather
  (:83-104); here the state update runs INSIDE the jitted step on global
  (batch-sharded) arrays, so GSPMD inserts the collective — no host sync.

State is an explicit pytree carried by the trainer; update_state is pure.
"""
from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

__all__ = [
    "SamplerState",
    "uniform_init",
    "loss2_init",
    "sample_t",
    "update_state",
    "make_schedule_sampler",
]

_UNIFORM_PROB = 0.001  # uniform_prob floor (resample.py:126)


class SamplerState(flax.struct.PyTreeNode):
    kind: str = flax.struct.field(pytree_node=False)
    loss_history: jnp.ndarray  # [T, history]
    loss_counts: jnp.ndarray  # [T] int32

    @property
    def history_per_term(self) -> int:
        return self.loss_history.shape[1]


def uniform_init(num_timesteps: int) -> SamplerState:
    return SamplerState(
        "uniform",
        jnp.zeros((num_timesteps, 1), jnp.float32),
        jnp.zeros((num_timesteps,), jnp.int32),
    )


def loss2_init(num_timesteps: int, history: int = 10) -> SamplerState:
    return SamplerState(
        "loss-second-moment",
        jnp.zeros((num_timesteps, history), jnp.float32),
        jnp.zeros((num_timesteps,), jnp.int32),
    )


def make_schedule_sampler(name: str, num_timesteps: int) -> SamplerState:
    """create_named_schedule_sampler parity (resample.py:8-25)."""
    if name == "uniform":
        return uniform_init(num_timesteps)
    if name == "loss-second-moment":
        return loss2_init(num_timesteps)
    raise ValueError(f"unknown schedule sampler: {name}")


def _weights(state: SamplerState) -> jnp.ndarray:
    """Sampling pmf over t (resample.py:135-142)."""
    T = state.loss_history.shape[0]
    warmed = jnp.all(state.loss_counts == state.history_per_term)
    w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    w_sum = jnp.sum(w)
    w = jnp.where(
        warmed & (w_sum > 0),
        w / jnp.maximum(w_sum, 1e-12) * (1 - _UNIFORM_PROB)
        + _UNIFORM_PROB / T,
        jnp.full((T,), 1.0 / T),
    )
    return w


def sample_t(state: SamplerState, rng: jax.Array, batch: int):
    """Importance-sample (t, weights) (resample.py:42-58)."""
    T = state.loss_history.shape[0]
    if state.kind == "uniform":
        t = jax.random.randint(rng, (batch,), 0, T)
        return t, jnp.ones((batch,), jnp.float32)
    p = _weights(state)
    t = jax.random.choice(rng, T, (batch,), p=p)
    weights = 1.0 / (T * p[t])
    return t, weights


def update_state(
    state: SamplerState, t: jnp.ndarray, losses: jnp.ndarray
) -> SamplerState:
    """Record per-element losses into the [T, history] ring buffer.

    Vectorized equivalent of update_with_all_losses (resample.py:144-154):
    for each batch element, shift that t's history left by one and append.
    With duplicate t in one batch, later elements win a full shift each —
    matching the reference's sequential loop.
    """
    if state.kind == "uniform":
        return state

    def body(carry, inp):
        hist, counts = carry
        ti, li = inp
        row = hist[ti]
        full = counts[ti] == hist.shape[1]
        new_row = jnp.where(
            full,
            jnp.concatenate([row[1:], li[None]]),
            row.at[jnp.minimum(counts[ti], hist.shape[1] - 1)].set(li),
        )
        hist = hist.at[ti].set(new_row)
        counts = counts.at[ti].set(
            jnp.minimum(counts[ti] + 1, hist.shape[1])
        )
        return (hist, counts), None

    (hist, counts), _ = jax.lax.scan(
        body,
        (state.loss_history, state.loss_counts),
        (t, losses.astype(jnp.float32)),
    )
    return SamplerState(state.kind, hist, counts)
