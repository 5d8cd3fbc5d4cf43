"""Multi-host initialization and host-side collective helpers.

Replaces the reference's MPI rendezvous (mpi4py bcast of
MASTER_ADDR/RANK/WORLD_SIZE then torch.distributed NCCL/Gloo init,
Disc_diff/guided_diffusion/dist_util.py:21-42) with
``jax.distributed.initialize`` — on Cloud TPU the coordinator is discovered
from the metadata service, so there is nothing to broadcast. The chunked MPI
checkpoint broadcast (dist_util.py:54-74) is obsolete: Orbax checkpoint reads
are per-host sharded (each host reads only its shard).
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_main",
    "process_index",
    "process_count",
    "sync_hosts",
    "all_gather_host",
]

log = logging.getLogger(__name__)
_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Single-process (including single-chip dev and the CPU test harness) is a
    no-op. Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return
    explicit = coordinator_address is not None
    auto = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ) or os.environ.get("JAX_NUM_PROCESSES") not in (None, "", "1")
    if explicit or auto:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed initialized: process %d/%d, %d local devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(),
        )
    _initialized = True


def is_main() -> bool:
    return jax.process_index() == 0


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def sync_hosts(tag: str = "barrier") -> None:
    """Cross-host barrier (replaces dist.barrier, train_util.py:328)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def all_gather_host(value: np.ndarray) -> np.ndarray:
    """Gather a small host array from every process (replaces the
    loss-aware-sampler all_gather, resample.py:83-104) via
    jax.experimental.multihost_utils."""
    if jax.process_count() == 1:
        return np.asarray(value)[None]
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(value))
    )
