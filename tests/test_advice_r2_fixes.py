"""Regression tests for the round-2 advisor findings (ADVICE.md r2):

1. (medium) FID Inception: Mixed_7c's pool branch must be MAX pooling in
   the pt-FID variant (pytorch-fid FIDInceptionE_2 patch), average for
   plain torchvision weights.
2. (low) DPM-Solver adaptive controller gates on the max of per-sample
   error norms, not a batch-wide RMS.
3. (low) fold_patches rejects kernel/stride combos that leave uncovered
   border pixels (zero fold-norm -> silent NaN).
4. (low) Checkpoints written under stream_mode='vmap' (the pre-r2 default
   'encoders' layout) restore into the sequential 'encoder_{i}' layout via
   convert_stream_layout / CheckpointManager's restore shim.
5. tensor2im is NaN/Inf-safe (no invalid-cast RuntimeWarning).
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.models.dsunet import DSUNet
from dsdiff_tpu.train.surgery import convert_stream_layout

TINY = dict(
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(4,),
    channel_mult=(1, 2),
    num_heads=4,
)


def test_inception_mixed7c_pool_mode():
    from dsdiff_tpu.models.inception import InceptionE, InceptionV3

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    m_avg = InceptionE(pool_mode="avg")
    m_max = InceptionE(pool_mode="max")
    params = m_avg.init(jax.random.PRNGKey(1), x)
    out_avg = m_avg.apply(params, x)
    out_max = m_max.apply(params, x)  # pool has no params: same tree works
    assert out_avg.shape == out_max.shape
    # identical weights, different pool branch -> outputs must differ
    assert float(jnp.max(jnp.abs(out_avg - out_max))) > 1e-6
    # variant wiring: pt_fid -> Mixed_7c max, torchvision -> avg
    assert InceptionV3(variant="pt_fid").variant == "pt_fid"
    net = InceptionV3()
    assert net.variant == "pt_fid"  # FID default matches the reference


def test_dpm_adaptive_error_is_per_sample_max():
    from dsdiff_tpu.core.dpm_solver import _adaptive_error

    shape = (4, 6, 6, 1)
    x_prev = jnp.zeros(shape)
    x_lower = jnp.zeros(shape)
    # sample 2 is far off; the rest are exact
    x_higher = jnp.zeros(shape).at[2].set(1.0)
    atol, rtol = 0.0078, 0.05
    err = float(_adaptive_error(x_higher, x_lower, x_prev, atol, rtol))
    # per-sample RMS of the bad sample alone
    err_solo = float(
        _adaptive_error(x_higher[2:3], x_lower[2:3], x_prev[2:3], atol, rtol)
    )
    assert err == pytest.approx(err_solo)
    # a batch-mean norm would have diluted it by ~sqrt(batch)
    assert err > err_solo / 2


def test_fold_patches_coverage_check():
    from dsdiff_tpu.core.patching import fold_patches, get_weighting

    # kernel 5, stride 3 over extent 8: offsets [0, 3], 3+5=8 -> covered OK
    w = get_weighting(5, 5, 2, 2)
    patches = jnp.ones((1, 4, 5, 5, 1))
    out = fold_patches(patches, (8, 8), (5, 5), (3, 3), w)
    assert np.all(np.isfinite(np.asarray(out)))
    # kernel 5, stride 4 over extent 10: offsets [0, 4], 4+5=9 < 10 ->
    # column 9 has zero fold-norm -> must raise, not emit NaN
    with pytest.raises(ValueError, match="uncovered"):
        fold_patches(patches, (10, 10), (5, 5), (4, 4), w)


def test_convert_stream_layout_roundtrip_and_apply():
    mv = DSUNet(in_channels=4, out_channels=1, stream_mode="vmap", **TINY)
    ms = DSUNet(in_channels=4, out_channels=1, stream_mode="sequential",
                **TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
    t = jnp.full((2,), 3.0)
    pv = mv.init(jax.random.PRNGKey(0), x, t)
    ps_template = jax.eval_shape(ms.init, jax.random.PRNGKey(0), x, t)

    converted = convert_stream_layout(jax.tree.map(np.asarray, pv))
    # converted structure must match the sequential template's key paths
    def paths(tree):
        return {
            "/".join(str(getattr(p, "key", p)) for p in path):
                tuple(leaf.shape)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(converted) == paths(ps_template)

    # function equality: the vmap model and the sequential model with
    # converted weights compute the same output
    out_v = mv.apply(pv, x, t)[0]
    out_s = ms.apply(converted, x, t)[0]
    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(out_s), atol=2e-5
    )

    # round-trip back to the vmapped layout
    back = convert_stream_layout(converted)
    for a, b in zip(jax.tree.leaves(back),
                    jax.tree.leaves(jax.tree.map(np.asarray, pv))):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_restore_across_stream_layouts(tmp_path):
    """A params-only restore of a vmap-layout checkpoint into a
    sequential-layout template goes through the _match_layout shim."""
    from dsdiff_tpu.train.checkpoints import _match_layout

    mv = DSUNet(in_channels=4, out_channels=1, stream_mode="vmap", **TINY)
    ms = DSUNet(in_channels=4, out_channels=1, stream_mode="sequential",
                **TINY)
    x = jnp.zeros((1, 32, 32, 4))
    t = jnp.zeros((1,))
    pv = jax.tree.map(np.asarray, mv.init(jax.random.PRNGKey(0), x, t))
    template = jax.eval_shape(ms.init, jax.random.PRNGKey(0), x, t)
    matched = _match_layout(template, pv)
    assert (jax.tree_util.tree_structure(matched)
            == jax.tree_util.tree_structure(template))
    out = ms.apply(matched, x, t)[0]
    ref = mv.apply(pv, x, t)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tensor2im_nan_safe():
    from dsdiff_tpu.utils.misc import tensor2im

    img = np.full((8, 8, 1), np.nan, np.float32)
    img[0, 0, 0] = np.inf
    img[0, 1, 0] = -np.inf
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = tensor2im(img)
    assert out.dtype == np.uint8
    assert out[0, 0, 0] == 255 and out[0, 1, 0] == 0 and out[1, 1, 0] == 0
