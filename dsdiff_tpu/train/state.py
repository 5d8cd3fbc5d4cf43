"""Train state: params + optimizer + EMA as one pytree.

Replaces Lightning's implicit optimizer/EMA state and the reference's
shadow-buffer LitEma (ldm/modules/ema.py:5-80) with an explicit
flax.struct dataclass that jit/pjit donate and Orbax checkpoints serialize
whole. EMA decay warmup matches LitEma: decay_t = min(decay, (1+t)/(10+t)).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "make_optimizer", "cosine_lr"]


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.9999)

    @classmethod
    def create(cls, apply_fn, params, tx, ema_decay: float = 0.9999):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            tx=tx,
            apply_fn=apply_fn,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        # LitEma warmup schedule (ldm/modules/ema.py:19-21,33-45)
        t = self.step.astype(jnp.float32)
        decay = jnp.minimum(self.ema_decay, (1.0 + t) / (10.0 + t))
        new_ema = jax.tree.map(
            lambda e, p: e * decay + (1.0 - decay) * p,
            self.ema_params,
            new_params,
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )


def cosine_lr(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 1e-6,
):
    """Per-step cosine annealing (the reference steps CosineAnnealingLR per
    batch, trainer_use_gaussian_diff.py:412-425 /
    ldm/models/autoencoder.py:300-319)."""
    schedules = []
    boundaries = []
    if warmup_steps > 0:
        schedules.append(
            optax.linear_schedule(0.0, base_lr, warmup_steps)
        )
        boundaries.append(warmup_steps)
    schedules.append(
        optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup_steps, 1),
            alpha=min_lr / base_lr,
        )
    )
    if len(schedules) == 1:
        return schedules[0]
    return optax.join_schedules(schedules, boundaries)


def make_optimizer(
    lr: float | optax.Schedule = 1e-4,
    weight_decay: float = 0.0,
    betas: tuple = (0.9, 0.999),
    grad_clip: float | None = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW (the reference trains with AdamW,
    trainer_use_gaussian_diff.py:412-418) with optional global-norm clipping
    and gradient accumulation (replaces the no_sync microbatch loop,
    train_util.py:252-287 — optax.MultiSteps accumulates on-device and the
    psum happens once per real step)."""
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
