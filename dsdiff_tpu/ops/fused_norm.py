"""Pallas fused GroupNorm + SiLU.

Target: the GN->SiLU prologue of every ResBlock (reference GroupNorm32 +
SiLU chains, ldm/modules/diffusionmodules/openaimodel.py + util.py:224-227)
— an HBM-bandwidth-bound chain. Split into:

1. group statistics as one XLA reduction pass (XLA emits an efficient
   single-pass reduce; no Pallas win available there), folded into
   per-(batch, channel) affine coefficients a = inv_std*scale,
   b = bias - mean*a,
2. ONE Pallas kernel applying y = x*a + b followed by SiLU in a single
   HBM read + write with [chunk, C] VMEM tiles — this is the fusion XLA
   does not always give at large spatial extents (separate normalize and
   activation kernels each re-reading HBM).

Layout: x [B, H, W, C] viewed as [B, H*W, C]; grid (B, spatial chunks).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_silu", "supports"]

_CHUNK = 1024  # spatial rows per VMEM tile


def supports(x, num_groups: int) -> bool:
    """Win region measured END-TO-END on v5e (isolated chain microbenches
    carry a ~2.7 ms/step scan-launch floor on the tunneled backend that
    swamps sub-ms ops — PROFILE.md §6): the flagship forward is fastest
    with the fused kernel at <=64^2 spatial and wide channels; widening to
    128^2/96ch was A/B-tested end-to-end and did not help."""
    import os

    B, H, W, C = x.shape
    if C % num_groups or (H * W) % 8:
        return False
    if os.environ.get("DSDIFF_GN_WIDE", "0") == "1":  # A/B knob
        return H * W <= 128 * 128 and C >= 96
    return H * W <= 64 * 64 and C >= 128


def _affine_silu_kernel(x_ref, a_ref, b_ref, o_ref):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)  # [chunk, C]
    y = x * a_ref[b] + b_ref[b]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def group_norm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5,
                    interpret: bool = False):
    """x: [B, H, W, C]; scale/bias: [C]. Returns SiLU(GroupNorm(x))."""
    B, H, W, C = x.shape
    n_rows = H * W
    chunk = min(_CHUNK, n_rows)
    while n_rows % chunk:
        chunk //= 2
    xr = x.reshape(B, n_rows, C)

    # group stats in f32 (one fused XLA reduction)
    xg = xr.astype(jnp.float32).reshape(B, n_rows, num_groups, C // num_groups)
    mean_g = jnp.mean(xg, axis=(1, 3))  # [B, G]
    var_g = jnp.mean(xg * xg, axis=(1, 3)) - mean_g**2
    inv_g = jax.lax.rsqrt(var_g + eps)
    rep = lambda v: jnp.repeat(v, C // num_groups, axis=1)  # [B, C]
    a = rep(inv_g) * scale[None].astype(jnp.float32)
    b = bias[None].astype(jnp.float32) - rep(mean_g) * a

    out = pl.pallas_call(
        _affine_silu_kernel,
        grid=(B, n_rows // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # full [B, C] coefficient tables resident in VMEM, indexed by
            # the batch program id (a [1, C] block would violate the
            # (8, 128) sublane tiling rule for B not divisible by 8)
            pl.BlockSpec((B, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_rows, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * n_rows * C,
            bytes_accessed=2 * B * n_rows * C * x.dtype.itemsize,
            transcendentals=B * n_rows * C,
        ),
    )(xr, a, b)
    return out.reshape(B, H, W, C)
