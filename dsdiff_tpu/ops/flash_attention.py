"""Pallas TPU flash attention.

Replaces the reference's xformers ``memory_efficient_attention`` CUDA path
(ldm/modules/attention.py:251-297) with a TPU-native blocked-softmax kernel:
Q tiles stay resident in VMEM while K/V tiles stream through, with the
standard running-max/running-sum online softmax so the [N, M] similarity
matrix never materializes in HBM.

The workload's sequences are short (<=1024 tokens at 256^2 with attention at
/8,/16,/32 — SURVEY.md §5 'long-context'), so one Q block per grid step with
an inner fori over K blocks is enough; there is no need for causal masking.

Layout contract matches :func:`dsdiff_tpu.ops.scaled_attention`:
[B, N, heads, D] in, same out.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "supports"]

_BQ = 512
_BK = 512


def supports(q, k, v) -> bool:
    """Shape gate: use Pallas only where it beats XLA.

    Measured on v5e (scripts/kernel_bench.py): 1.2-1.3x faster at N=1024
    (the 256^2 workload's /8 and /16 attention), slower at N<=256 (kernel
    launch dominates) and N>=4096 (XLA's blocking wins there).
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    if D % 8 or D > 256:
        return False
    if N % 128 or M % 128:
        return False
    return 512 <= N <= 2048 and 512 <= M <= 2048


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale  # [bq, D]
    M = k_ref.shape[1]
    n_kb = M // bk
    bq, D = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)  # [bk, D]
        v = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """softmax(q k^T / sqrt(D)) v with online softmax, [B, N, H, D] layout.

    Forward runs the Pallas kernel; the backward pass (custom_vjp below)
    differentiates the mathematically-identical XLA attention — exact
    gradients without a hand-written backward kernel.
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    # fold batch and heads; heads-minor transpose keeps N contiguous
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, M, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, M, D)

    bq = min(_BQ, N)
    bk = min(_BK, M)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, bk=bk, scale=scale),
        grid=(B * H, N // bq),
        in_specs=[
            pl.BlockSpec(
                (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, M, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, M, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * M * D,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=B * H * N * M,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)


def _reference_attention(q, k, v):
    """XLA attention with identical math (f32 softmax), for the VJP."""
    D = q.shape[-1]
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(D)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )


def _fa_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _fa_bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
