"""Shape/dtype/init tests for the denoiser families (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.models import UNet
from dsdiff_tpu.models.dsunet import DSUNet

TINY = dict(
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(4,),
    channel_mult=(1, 2),
    num_heads=4,
)


def test_unet_shapes_and_zero_init():
    m = UNet(in_channels=2, out_channels=1, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 2))
    t = jnp.array([0.0, 10.0])
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), x, t)
    # real init + apply
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32
    # zero-init out conv -> exactly zero output at init
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_unet_learn_sigma_channels():
    m = UNet(in_channels=1, out_channels=2, **TINY)
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,))
    shapes = jax.eval_shape(
        lambda: m.apply(m.init(jax.random.PRNGKey(0), x, t), x, t)
    )
    assert shapes.shape == (1, 32, 32, 2)


def test_unet_class_conditional():
    m = UNet(in_channels=1, out_channels=1, num_classes=5, **TINY)
    x = jnp.zeros((2, 32, 32, 1))
    t = jnp.zeros((2,))
    y = jnp.array([0, 3])
    params = m.init(jax.random.PRNGKey(0), x, t, y=y)
    out = m.apply(params, x, t, y=y)
    assert out.shape == (2, 32, 32, 1)


def test_unet_cross_attention_context():
    m = UNet(
        in_channels=1, out_channels=1, use_spatial_transformer=True,
        context_dim=16, **TINY,
    )
    x = jnp.zeros((2, 32, 32, 1))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 7, 16))
    params = m.init(jax.random.PRNGKey(0), x, t, ctx)
    out = m.apply(params, x, t, ctx)
    assert out.shape == (2, 32, 32, 1)


def test_unet_fft_attention():
    m = UNet(
        in_channels=1, out_channels=1, use_spatial_transformer=True,
        use_fft_attention=True, **TINY,
    )
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,))
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == (1, 32, 32, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dsunet_outputs_and_features():
    m = DSUNet(in_channels=4, out_channels=1, **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(0), x, t)
    out, feats = m.apply(params, x, t)
    assert out.shape == (2, 32, 32, 1)
    # feature groups: style/content over (a, al, l); anatomy (a, al);
    # lesion (al, l); n_style_content 4-tuple (model.py:751-756)
    assert feats["style"].shape[0] == 3
    assert feats["content"].shape[0] == 3
    assert feats["anatomy"].shape[0] == 2
    assert feats["lesion"].shape[0] == 2
    assert feats["n_style_content"].shape[0] == 4


def test_dsunet_per_stream_params_differ():
    """Each stream must own distinct weights (the reference deep-copies its
    4 encoders, model.py:522-524) — in both stream execution modes."""
    # sequential (default): four named encoder submodules
    m = DSUNet(in_channels=4, out_channels=1, **TINY)
    x = jnp.zeros((1, 32, 32, 4))
    params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    encs = [params["params"][f"encoder_{s}"] for s in range(4)]
    k0 = jax.tree.leaves(encs[0])
    k1 = jax.tree.leaves(encs[1])
    assert any(
        a.shape == b.shape and float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(k0, k1) if a.ndim > 2
    )
    # vmap mode: one encoder collection with a leading stream axis
    mv = DSUNet(in_channels=4, out_channels=1, stream_mode="vmap", **TINY)
    pv = mv.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    leaves = jax.tree.leaves(pv["params"]["encoders"])
    assert all(l.shape[0] == 4 for l in leaves)  # stream axis everywhere
    assert any(
        float(jnp.max(jnp.abs(l[0] - l[1]))) > 0 for l in leaves if l.ndim > 2
    )


def test_dsunet_stream_modes_agree():
    """sequential and vmap modes compute the same function when fed the
    same per-stream weights (the sequential path is a TPU-side lowering
    choice, not a semantic change)."""
    mv = DSUNet(in_channels=4, out_channels=1, stream_mode="vmap", **TINY)
    ms = DSUNet(in_channels=4, out_channels=1, stream_mode="sequential",
                **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
    t = jnp.full((2,), 3.0)
    pv = mv.init(jax.random.PRNGKey(0), x, t)
    ps = ms.init(jax.random.PRNGKey(0), x, t)
    # copy vmap's stacked per-stream encoder weights into the four
    # sequential submodules
    new = dict(ps["params"])
    for s in range(4):
        new[f"encoder_{s}"] = jax.tree.map(
            lambda a: a[s], pv["params"]["encoders"]
        )
        # non-encoder params are shared verbatim
    shared = {k: v for k, v in pv["params"].items() if k != "encoders"}
    new.update(shared)
    out_v, _ = mv.apply(pv, x, t)
    out_s, _ = ms.apply({"params": new}, x, t)
    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(out_s), atol=2e-5
    )


def test_dsunet_two_channel_fallback():
    m = DSUNet(in_channels=4, out_channels=1, **TINY)
    x4 = jnp.zeros((1, 32, 32, 4))
    params = m.init(jax.random.PRNGKey(0), x4, jnp.zeros((1,)))
    out, _ = m.apply(params, jnp.zeros((1, 32, 32, 2)), jnp.zeros((1,)))
    assert out.shape == (1, 32, 32, 1)


def test_attention_fallback_matches_reference_softmax():
    """ops.scaled_attention (XLA path on CPU) == straight softmax attention."""
    from dsdiff_tpu.ops import scaled_attention

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, 16, 4, 8))
    k = jax.random.normal(k2, (2, 16, 4, 8))
    v = jax.random.normal(k3, (2, 16, 4, 8))
    out = scaled_attention(q, k, v)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(8)
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dsunet_2ch_equals_zero_padded_4ch():
    """The 2-channel fallback (model.py:652-657) must equal a 4-channel
    input whose al/l streams are zero."""
    m = DSUNet(in_channels=4, out_channels=1, **TINY)
    rng = jax.random.PRNGKey(1)
    x2 = jax.random.normal(rng, (2, 32, 32, 2))
    x4 = jnp.concatenate([x2, jnp.zeros((2, 32, 32, 2))], axis=-1)
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(0), x4, t)
    o2, f2 = m.apply(params, x2, t)
    o4, f4 = m.apply(params, x4, t)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o4), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f2["style"]), np.asarray(f4["style"]), atol=1e-6
    )


def test_dsunet_stream_routing():
    """Stream->head routing (model.py:694-712): the anatomy head sees only
    the a/al streams, the lesion head only al/l. Perturbing the anatomy
    channel must change the anatomy features but leave the lesion features
    untouched, and vice versa."""
    m = DSUNet(in_channels=4, out_channels=1, **TINY)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 32, 32, 4))
    t = jnp.zeros((1,))
    params = m.init(jax.random.PRNGKey(0), x, t)
    _, base = m.apply(params, x, t)

    _, f_a = m.apply(params, x.at[..., 1].add(0.5), t)  # perturb anatomy
    assert float(jnp.abs(f_a["anatomy"] - base["anatomy"]).max()) > 0
    np.testing.assert_allclose(
        np.asarray(f_a["lesion"][1]), np.asarray(base["lesion"][1]),
        atol=1e-6,  # the l-stream lesion feature never sees stream a
    )

    _, f_l = m.apply(params, x.at[..., 3].add(0.5), t)  # perturb lesion
    assert float(jnp.abs(f_l["lesion"] - base["lesion"]).max()) > 0
    np.testing.assert_allclose(
        np.asarray(f_l["anatomy"]), np.asarray(base["anatomy"]), atol=1e-6
    )


def test_dsunet_three_channel():
    m = DSUNet(in_channels=4, out_channels=1, **TINY)
    x4 = jnp.zeros((1, 32, 32, 4))
    params = m.init(jax.random.PRNGKey(0), x4, jnp.zeros((1,)))
    x3 = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    o3, _ = m.apply(params, x3, jnp.zeros((1,)))
    # equals the 4ch input with a zero lesion stream
    o4, _ = m.apply(
        params, jnp.concatenate([x3, jnp.zeros((1, 32, 32, 1))], -1),
        jnp.zeros((1,)),
    )
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o4), atol=1e-6)
