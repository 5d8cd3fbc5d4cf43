"""MedSegDiff denoiser variants (seg_UNet.py:497-1110) and SpectralNorm
(UNet_DS_Diff/model.py:65-132) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.models.seg_unet import HighwayUNet, MedSegDiffUNet


@pytest.mark.parametrize("mode", ["highway", "anchor"])
def test_medseg_variants_forward(mode):
    m = MedSegDiffUNet(
        xt_channels=1, out_channels=1, model_channels=8,
        num_res_blocks=1, attention_resolutions=(4,),
        channel_mult=(1, 2, 2), num_heads=2, mode=mode,
        highway_features=8,
    )
    x = jnp.zeros((2, 32, 32, 4))  # x_t + 3 cond channels
    t = jnp.zeros((2,))
    params = m.init(jax.random.PRNGKey(0), x, t)
    out, aux = m.apply(params, x, t)
    assert out.shape == (2, 32, 32, 1)
    assert aux["cal"].shape == (2, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # jits cleanly
    jout, jaux = jax.jit(lambda p, a, b: m.apply(p, a, b))(params, x, t)
    np.testing.assert_allclose(np.asarray(jout), np.asarray(out), rtol=1e-5)


def test_highway_fusion_uses_external_features():
    """The fuse-mode highway must respond to the handed-over diffusion
    features (x = x * ha * hb gating, seg_UNet.py:2493-2502)."""
    hw = HighwayUNet(in_channels=2, base_features=8, num_pool=2,
                     emb_dim=16)
    x = jnp.ones((1, 32, 32, 2))
    hs = [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16))]
    params = hw.init(jax.random.PRNGKey(0), x, hs)
    emb1, cal1 = hw.apply(params, x, hs)
    emb2, _ = hw.apply(params, x, [2.0 * h for h in hs])
    assert emb1.shape[-1] == 16
    assert not np.allclose(np.asarray(emb1), np.asarray(emb2))
    assert cal1.shape == (1, 32, 32, 1)


@pytest.mark.slow
def test_anchor_mode_gradient_blocked():
    """Anchor features enter the stem via stop_gradient
    (UNetModel_newpreview :1102 .detach()): the highway receives no gradient
    from the diffusion loss."""
    m = MedSegDiffUNet(
        xt_channels=1, out_channels=1, model_channels=8,
        num_res_blocks=1, attention_resolutions=(),
        channel_mult=(1, 2), mode="anchor", highway_features=8,
    )
    x = jnp.ones((1, 16, 16, 2))
    t = jnp.zeros((1,))
    params = m.init(jax.random.PRNGKey(0), x, t)
    # break the zero-init output head so gradients actually flow
    params = jax.tree.map(lambda v: v + 0.01, params)

    def loss(p):
        out, _ = m.apply(p, x, t)
        return jnp.mean(out**2)

    g = jax.grad(loss)(params)
    hw_leaves = jax.tree.leaves(g["params"]["hwm"])
    assert all(float(jnp.abs(l).max()) == 0.0 for l in hw_leaves)
    # ... while the trunk does get gradients
    enc_leaves = jax.tree.leaves(g["params"]["encoder"])
    assert any(float(jnp.abs(l).max()) > 0 for l in enc_leaves)


def test_medseg_registry():
    from dsdiff_tpu.models import build_model

    m = build_model("medseg_v1", in_channels=99, out_channels=1,
                    model_channels=8, num_res_blocks=1,
                    attention_resolutions=(), channel_mult=(1, 2),
                    highway_features=8)
    assert m.mode == "highway"
    m2 = build_model("medseg_new", out_channels=1, model_channels=8,
                     num_res_blocks=1, attention_resolutions=(),
                     channel_mult=(1, 2), highway_features=8)
    assert m2.mode == "anchor"


def test_spectral_norm_conv_unit_sigma():
    """The effective kernel's top singular value is ~1 regardless of the
    raw kernel scale (SpectralNorm capability, model.py:65-132)."""
    from dsdiff_tpu.models.layers import SpectralNormConv

    conv = SpectralNormConv(6, (3, 3), padding=1, n_iter=20, use_bias=False)
    x = jnp.zeros((1, 8, 8, 3))
    params = conv.init(jax.random.PRNGKey(0), x)
    # scale the kernel wildly: output must be invariant (sigma divides out)
    big = jax.tree.map(lambda k: 37.0 * k, params)
    xr = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(conv.apply(params, xr)),
        np.asarray(conv.apply(big, xr)), rtol=1e-4, atol=1e-5,
    )
    # top singular value of the normalized kernel == 1
    k = np.asarray(params["params"]["kernel"])
    w = k.reshape(-1, k.shape[-1])
    sigma = np.linalg.svd(w, compute_uv=False)[0]
    k_sn = w / sigma
    assert abs(np.linalg.svd(k_sn, compute_uv=False)[0] - 1.0) < 1e-5


def test_content_discriminator_spectral():
    from dsdiff_tpu.train.adversarial import ContentDiscriminator

    d = ContentDiscriminator(n_streams=3, base_channels=8,
                             use_spectral_norm=True)
    f = jnp.ones((4, 16, 16, 8))
    params = d.init(jax.random.PRNGKey(0), f)
    logits = d.apply(params, f)
    assert logits.shape == (4, 3)
    assert bool(jnp.all(jnp.isfinite(logits)))
