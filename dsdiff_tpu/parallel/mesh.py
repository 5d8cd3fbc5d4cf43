"""Device mesh + sharding helpers: the framework's scale-out backbone.

TPU-native replacement for the reference's entire distributed stack
(SURVEY.md §2.5): MPI rendezvous + NCCL DDP
(Disc_diff/guided_diffusion/dist_util.py:21-42, train_util.py:111-127) become
one GSPMD mesh; gradient bucketing/no_sync microbatching become XLA-inserted
collectives over ICI. The mesh axes:

- ``data``  — batch (data-parallel). Collectives: psum of grads (XLA emits).
- ``fsdp``  — parameter/optimizer sharding axis (ZeRO-style). ``state_
  sharding`` places the FULL TrainState: params, EMA *and* the Adam moments
  (mu/nu are 2x the param bytes — the dominant memory term ZeRO removes;
  the memory role of the reference's fp16 master params + DDP,
  Disc_diff/guided_diffusion/train_util.py:111-127). The 94M-param flagship
  doesn't need it, but the axis is first-class so the C=320/1.04B config
  and DiT-XL shard without code changes.

Batches are host->device transferred already sharded via
``jax.make_array_from_process_local_data`` in multi-process mode, or a simple
device_put(NamedSharding) single-process.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_sharding",
    "state_sharding",
    "sharded_byte_fraction",
    "shard_batch",
    "local_mesh",
]


def make_mesh(
    n_data: int | None = None,
    n_fsdp: int = 1,
    devices: Sequence | None = None,
) -> Mesh:
    """Build a ('data', 'fsdp') mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        n_data = total // n_fsdp
    assert n_data * n_fsdp == total, (
        f"mesh {n_data}x{n_fsdp} != {total} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def local_mesh() -> Mesh:
    """Single-device mesh (bench / debugging on one chip)."""
    return make_mesh(devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over 'data' for activations/batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params, min_size_to_shard: int = 2**18):
    """ZeRO-style sharding spec tree: large parameter leaves are sharded on
    their largest divisible axis over 'fsdp'; everything else replicated.

    With n_fsdp == 1 this degenerates to full replication (pure DP).
    """
    n_fsdp = mesh.shape["fsdp"]

    def spec_for(leaf):
        if n_fsdp == 1 or leaf.size < min_size_to_shard:
            return NamedSharding(mesh, P())
        # shard the largest axis divisible by n_fsdp
        order = sorted(
            range(leaf.ndim), key=lambda i: leaf.shape[i], reverse=True
        )
        for ax in order:
            if leaf.shape[ax] % n_fsdp == 0:
                spec = [None] * leaf.ndim
                spec[ax] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)


def state_sharding(mesh: Mesh, state, min_size_to_shard: int = 2**18):
    """ZeRO sharding specs for a full TrainState pytree.

    Applies the ``param_sharding`` largest-divisible-axis rule to params,
    EMA *and* the optimizer state (the Adam mu/nu trees mirror the param
    tree, so each moment leaf lands on the same axis as its parameter;
    scalars like the Adam ``count`` replicate). This is what makes 'fsdp'
    actually ZeRO: optimizer moments are 2x the parameter bytes — the
    dominant memory term at C=320/1.04B scale (PROFILE.md §9). Reference
    stake: the memory role of fp16 master params + DDP in
    Disc_diff/guided_diffusion/train_util.py:111-127.

    Works on a concrete TrainState or an eval_shape'd one (AOT planning).
    """
    return state.replace(
        step=replicated(mesh),
        params=param_sharding(mesh, state.params, min_size_to_shard),
        ema_params=param_sharding(mesh, state.ema_params,
                                  min_size_to_shard),
        opt_state=param_sharding(mesh, state.opt_state, min_size_to_shard),
    )


def sharded_byte_fraction(tree, shardings) -> float:
    """Fraction of ``tree``'s bytes whose sharding has an 'fsdp' axis."""
    tot = shard = 0
    for leaf, sh in zip(jax.tree.leaves(tree), jax.tree.leaves(shardings)):
        nb = leaf.size * leaf.dtype.itemsize
        tot += nb
        if any(ax == "fsdp" for ax in sh.spec):
            shard += nb
    return shard / max(tot, 1)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Host numpy batch -> global device arrays sharded over 'data'.

    In multi-process mode each process contributes its local rows
    (make_array_from_process_local_data); single-process just device_puts.
    """
    sh = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return {
        k: put(v)
        for k, v in batch.items()
        if isinstance(v, np.ndarray) or np.isscalar(v)
    }
