"""Pallas kernel correctness in interpret mode (CPU) vs reference math."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dsdiff_tpu.ops import fused_norm


def _ref_gn_silu(x, scale, bias, groups, eps=1e-5):
    B, H, W, C = x.shape
    g = x.astype(jnp.float32).reshape(B, H * W, groups, C // groups)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    y = (g - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, H, W, C) * scale + bias
    return y * jax.nn.sigmoid(y)


def test_fused_group_norm_silu_matches_reference():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 32)) * 2.0 + 0.5
    scale = jax.random.normal(jax.random.PRNGKey(1), (32,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (32,)) * 0.1
    out = fused_norm.group_norm_silu(x, scale, bias, num_groups=8,
                                     interpret=True)
    ref = _ref_gn_silu(x, scale, bias, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_group_norm_silu_bf16():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 16),
                          jnp.bfloat16)
    out = fused_norm.group_norm_silu(
        x, jnp.ones((16,)), jnp.zeros((16,)), num_groups=4, interpret=True
    )
    assert out.dtype == jnp.bfloat16
    ref = _ref_gn_silu(x.astype(jnp.float32), jnp.ones((16,)),
                       jnp.zeros((16,)), 4)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.05
    )


def test_flash_attention_interpret_matches_xla():
    from dsdiff_tpu.ops import flash_attention as fa
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # run the flash kernel in interpret mode by monkeypatching pallas_call
    B, N, Hh, D = 1, 512, 2, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, N, Hh, D))
    k = jax.random.normal(k2, (B, N, Hh, D))
    v = jax.random.normal(k3, (B, N, Hh, D))
    assert fa.supports(q, k, v)

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = interp
    try:
        out = fa.flash_attention(q, k, v)
    finally:
        pl.pallas_call = orig
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_supports_gate():
    from dsdiff_tpu.ops import flash_attention as fa

    bad = jnp.zeros((1, 100, 2, 64))  # N not /128
    assert not fa.supports(bad, bad, bad)
    bad2 = jnp.zeros((1, 1024, 2, 300))  # D too large
    assert not fa.supports(bad2, bad2, bad2)
    small = jnp.zeros((1, 256, 2, 64))  # below the measured win region
    assert not fa.supports(small, small, small)
    good = jnp.zeros((1, 1024, 2, 64))
    assert fa.supports(good, good, good)


def test_flash_attention_has_gradients():
    """The Pallas forward must be differentiable (custom VJP against the
    XLA-math reference) — training at 256^2 engages the kernel."""
    from dsdiff_tpu.ops import flash_attention as fa
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = interp
    try:
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 2, 64))

        def loss(q):
            return jnp.sum(fa.flash_attention(q, q, q) ** 2)

        g = jax.grad(loss)(q)

        def loss_ref(q):
            return jnp.sum(fa._reference_attention(q, q, q) ** 2)

        g_ref = jax.grad(loss_ref)(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-4)
    finally:
        pl.pallas_call = orig
