"""DisC U-Net, DiT, VAE, and conditioning-wrapper tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.models import (
    AutoencoderKL, DiagonalGaussian, DiscUNet, DiT, build_model,
    conditioned_call, make_dit,
)

TINY = dict(
    model_channels=32, num_res_blocks=1, attention_resolutions=(4,),
    channel_mult=(1, 2), num_heads=4,
)


@pytest.mark.parametrize("n", [3, 4])
def test_disc_unet_streams(n):
    m = DiscUNet(n_streams=n, out_channels=1, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, n))
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(0), x, t)
    out, feats = m.apply(params, x, t)
    assert out.shape == (2, 32, 32, 1)
    assert feats["common"].shape[0] == n
    assert feats["distinct"].shape[0] == n


def test_dit_shapes_and_zero_init():
    m = DiT(input_size=32, patch_size=8, in_channels=2, out_channels=1,
            hidden_size=64, depth=2, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 2))
    t = jnp.array([0.0, 10.0])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 32, 32, 1)
    # zero-init final layer -> zero output at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_dit_class_conditional_cfg_dropout():
    m = DiT(input_size=16, patch_size=8, in_channels=1, out_channels=1,
            hidden_size=32, depth=1, num_heads=4, num_classes=3)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,))
    y = jnp.array([0, 2])
    params = m.init(jax.random.PRNGKey(0), x, t, y)
    out = m.apply(params, x, t, y)
    assert out.shape == (2, 16, 16, 1)
    # train mode needs dropout rng
    out2 = m.apply(params, x, t, y, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(5)})
    assert out2.shape == (2, 16, 16, 1)


def test_dit_registry():
    m = make_dit("DiT_S_8", input_size=16, in_channels=1, out_channels=1)
    assert m.depth == 12 and m.hidden_size == 384


def test_vae_roundtrip_shapes():
    m = AutoencoderKL(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=2,
                      embed_dim=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
    params = m.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(2))
    rec, post = m.apply(params, x, jax.random.PRNGKey(2))
    assert rec.shape == x.shape
    assert post.mean.shape == (2, 8, 8, 2)
    z = m.apply(params, x, method="encode").mode()
    dec = m.apply(params, z, method="decode")
    assert dec.shape == x.shape


def test_diagonal_gaussian_kl_golden():
    # standard normal -> KL 0
    d = DiagonalGaussian(jnp.zeros((1, 2, 2, 1)), jnp.zeros((1, 2, 2, 1)))
    np.testing.assert_allclose(float(d.kl()[0]), 0.0, atol=1e-6)
    # mean 1, var 1: KL = 0.5 per element * 4 elements
    d2 = DiagonalGaussian(jnp.ones((1, 2, 2, 1)), jnp.zeros((1, 2, 2, 1)))
    np.testing.assert_allclose(float(d2.kl()[0]), 2.0, atol=1e-5)


def test_conditioned_call_modes():
    calls = {}

    def fake(x, t, context=None, y=None):
        calls["x"] = x
        calls["ctx"] = context
        calls["y"] = y
        return x

    x = jnp.zeros((1, 4, 4, 1))
    t = jnp.zeros((1,))
    c = jnp.ones((1, 4, 4, 2))
    ctx = jnp.ones((1, 3, 8))
    conditioned_call(fake, "concat", x, t, {"c_concat": [c]})
    assert calls["x"].shape[-1] == 3
    conditioned_call(fake, "crossattn", x, t, {"c_crossattn": [ctx, ctx]})
    assert calls["ctx"].shape == (1, 6, 8)
    conditioned_call(fake, "hybrid", x, t,
                     {"c_concat": [c], "c_crossattn": [ctx]})
    assert calls["x"].shape[-1] == 3 and calls["ctx"] is not None
    conditioned_call(fake, "adm", x, t, {"c_adm": jnp.ones((1, 5))})
    assert calls["y"].shape == (1, 5)
    with pytest.raises(ValueError):
        conditioned_call(fake, "bogus", x, t, {})


def test_build_model_registry():
    m = build_model("unet", in_channels=1, out_channels=1, **TINY)
    assert m.model_channels == 32
    with pytest.raises(ValueError):
        build_model("nope")


@pytest.mark.slow
def test_dsunet_split_cached_equivalence():
    from dsdiff_tpu.models.dsunet_cached import DSUNetSplit, \
        make_cached_denoiser

    m = DSUNetSplit(model_channels=16, num_res_blocks=1,
                    attention_resolutions=(2,), channel_mult=(1, 2),
                    num_heads=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(1), x, t)
    out, feats = m.apply(params, x, t)
    assert out.shape == (2, 16, 16, 1)
    assert feats["content"].shape[0] == 3
    # cached denoiser reproduces the full forward when t_ref matches t
    den = make_cached_denoiser(m, params, x[..., 1:], t_ref=0.0)
    out_c = den(x[..., :1], t)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out),
                               atol=1e-5)
    # separate per-stream condition params + distinct noise encoder
    assert "noise_encoder" in params["params"]
    for s in range(3):
        assert f"cond_encoder_{s}" in params["params"]
    # vmap mode keeps the stacked [3, ...] condition params
    mv = DSUNetSplit(model_channels=16, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=2, stream_mode="vmap", dtype=jnp.float32)
    pv = mv.init(jax.random.PRNGKey(1), x, t)
    cond_leaf = jax.tree.leaves(pv["params"]["cond_encoders"])[0]
    assert cond_leaf.shape[0] == 3


@pytest.mark.slow
def test_dsunet_split_cond_t_ref_exact():
    """cond_t_ref pins the condition encoders to one reference embedding
    in BOTH the training forward and the cache, so cached sampling is
    exact at EVERY t (without it, t != t_ref is an approximation — the
    mismatch measured at -7 dB PSNR at 256², PARITY.md round 3)."""
    from dsdiff_tpu.models.dsunet_cached import DSUNetSplit, \
        make_cached_denoiser

    kw = dict(model_channels=16, num_res_blocks=1,
              attention_resolutions=(2,), channel_mult=(1, 2),
              num_heads=2, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.full((2,), 437.0)  # far from t_ref on purpose
    m = DSUNetSplit(cond_t_ref=500.0, **kw)
    params = m.init(jax.random.PRNGKey(1), x, t)
    # perturb away from init: zero_module'd residual branches make the
    # fresh model's outputs emb-independent, which would mask the t path
    leaves, treedef = jax.tree.flatten(params)
    prng = jax.random.PRNGKey(2)
    leaves = [
        leaf + 0.05 * jax.random.normal(jax.random.fold_in(prng, i),
                                        leaf.shape, leaf.dtype)
        for i, leaf in enumerate(leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    out, _ = m.apply(params, x, t)
    den = make_cached_denoiser(m, params, x[..., 1:], t_ref=500.0)
    np.testing.assert_allclose(np.asarray(den(x[..., :1], t)),
                               np.asarray(out), atol=1e-5)
    # mechanism check on the cache itself (the output head is
    # zero-initialized, so compare condition features, not outputs):
    # per-t encoders give t-dependent caches; cond_t_ref pins them
    def cache_at(model, t_ref):
        h, _ = model.apply(params, x[..., 1:],
                           jnp.full((2,), t_ref, jnp.float32),
                           method=DSUNetSplit.encode_conditions)
        return np.asarray(h)

    m0 = DSUNetSplit(**kw)
    assert float(np.abs(cache_at(m0, 0.0) - cache_at(m0, 900.0)).max()) > 1e-4
    np.testing.assert_allclose(cache_at(m, 0.0), cache_at(m, 900.0))
