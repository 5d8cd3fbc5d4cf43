"""Int8 quantized inference path (ops/quant.py).

The quantized conv must agree with the f32 conv to quantization tolerance,
the interceptor must swap only eligible convs (leaving stems/heads and
non-conv modules untouched), and a full denoiser forward under
``int8_convs`` must stay close to the bf16 forward.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.ops.quant import (
    int8_conv,
    int8_convs,
    quantize_activation,
    quantize_weight,
    wrap_quantized,
)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 16, 32)) * 0.1
    w_i8, scale = quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and scale.shape == (32,)
    err = np.abs(np.asarray(w_i8, np.float32) * np.asarray(scale) - np.asarray(w))
    # max error is half an LSB per channel
    assert err.max() <= float(np.asarray(scale).max()) * 0.51


def test_quantize_activation_zero_safe():
    x_i8, scale = quantize_activation(jnp.zeros((2, 4, 4, 8)))
    assert float(scale) > 0 and int(np.abs(np.asarray(x_i8)).max()) == 0


@pytest.mark.parametrize(
    "strides,padding,groups",
    [((1, 1), 1, 1), ((2, 2), 1, 1), ((1, 1), "SAME", 1),
     ((1, 1), "VALID", 1), ((1, 1), 1, 4)],
)
def test_int8_conv_matches_f32(strides, padding, groups):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 16, 16, 32))
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 32 // groups, 32)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(3), (32,)) * 0.01
    got = int8_conv(x, w, b, strides=strides, padding=padding,
                    feature_group_count=groups)
    from jax import lax
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    pad = padding if isinstance(padding, str) else [(padding, padding)] * 2
    want = lax.conv_general_dilated(
        x, w, strides, pad, dimension_numbers=dn,
        feature_group_count=groups) + b
    assert got.shape == want.shape
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1, name="stem")(x)     # cin=1: skip
        x = nn.silu(nn.Conv(64, (3, 3), padding=1, name="mid1")(x))
        x = nn.silu(nn.Conv(64, (3, 3), padding=1, name="mid2")(x))
        return nn.Conv(1, (3, 3), padding=1, name="head")(x)  # cout=1: skip


def test_interceptor_swaps_only_eligible_convs():
    m = _Tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    params = m.init(jax.random.PRNGKey(1), x)

    base = m.apply(params, x)
    with int8_convs(min_channels=32):
        quant = m.apply(params, x)
    # mid convs quantized -> output differs, but only by quant noise
    assert not np.allclose(np.asarray(base), np.asarray(quant))
    rel = float(jnp.linalg.norm(quant - base) / jnp.linalg.norm(base))
    assert rel < 0.05, rel

    # with an impossible threshold nothing is swapped -> bitwise identical
    with int8_convs(min_channels=10**6):
        same = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))


def test_wrap_quantized_composes_with_jit():
    m = _Tiny()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    params = m.init(jax.random.PRNGKey(1), x)
    fn = jax.jit(wrap_quantized(lambda p, xx: m.apply(p, xx)))
    with int8_convs(min_channels=32):
        want = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(fn(params, x)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_calibrated_static_scales():
    """calibrate_act_scales captures one scale per eligible conv; the
    static path agrees with dynamic when calibration covers the eval
    input, and still saturates gracefully when it doesn't."""
    from dsdiff_tpu.ops.quant import calibrate_act_scales

    m = _Tiny()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 1))
    params = m.init(jax.random.PRNGKey(1), x)

    def fwd(xx):
        return m.apply(params, xx)

    scales = calibrate_act_scales(fwd, [(x,)], min_channels=32)
    assert scales and all(isinstance(v, float) and v > 0
                          for v in scales.values())
    # every key resolves to a module path inside the model (eligible convs
    # only — the 1-channel stem must NOT be calibrated)
    assert all("/" not in k or not k.startswith("stem") for k in scales)

    with int8_convs(min_channels=32):
        dyn = m.apply(params, x)
    with int8_convs(min_channels=32, act_scales=scales):
        stat = m.apply(params, x)
    # calibrated on the same input -> identical scales -> identical output
    np.testing.assert_allclose(np.asarray(stat), np.asarray(dyn),
                               rtol=1e-5, atol=1e-5)

    # out-of-range input saturates (stays finite, bounded error)
    with int8_convs(min_channels=32, act_scales=scales):
        hot = m.apply(params, x * 10.0)
    assert np.isfinite(np.asarray(hot)).all()


def test_calibrated_sampling_chain():
    """Static scales bake into the jitted DDIM scan (no tracer leak) and
    the chain stays close to the dynamic-quantized chain."""
    from dsdiff_tpu.core import schedules
    from dsdiff_tpu.models.dsunet import DSUNet
    from dsdiff_tpu.ops.quant import calibrate_act_scales
    from dsdiff_tpu.train.step import TaskConfig, make_sample_fn

    m = DSUNet(in_channels=4, out_channels=2, model_channels=32,
               num_res_blocks=1, channel_mult=(1, 2),
               attention_resolutions=(), num_heads=2)
    x = jnp.zeros((1, 16, 16, 4))
    params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 20)
    rsched = schedules.respace(betas, schedules.space_timesteps(20, "5"))
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      learn_sigma=True)
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))

    # calibrate the denoiser at a few (x_t, t) points along the trajectory
    cal_rng = jax.random.PRNGKey(3)
    inputs = []
    for t in (0.0, 9.0, 19.0):
        cal_rng, k = jax.random.split(cal_rng)
        x_t = jax.random.normal(k, (2, 16, 16, 1))
        inputs.append((params, jnp.concatenate([x_t, cond], -1),
                       jnp.full((2,), t)))
    scales = calibrate_act_scales(m.apply, inputs, min_channels=32)
    assert scales

    out_dyn = make_sample_fn(
        wrap_quantized(m.apply), rsched, task, "ddim")(
        params, cond, jax.random.PRNGKey(2))
    out_stat = make_sample_fn(
        wrap_quantized(m.apply, act_scales=scales), rsched, task, "ddim")(
        params, cond, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out_stat)).all()
    diff = float(jnp.max(jnp.abs(out_stat - out_dyn)))
    assert diff < 0.5, diff


def test_int8_sampling_chain():
    """The full DDIM sampling scan with a quantized apply_fn compiles and
    produces finite output (the bench.py int8=True path at tiny scale)."""
    from dsdiff_tpu.core import schedules
    from dsdiff_tpu.models.dsunet import DSUNet
    from dsdiff_tpu.train.step import TaskConfig, make_sample_fn

    m = DSUNet(in_channels=4, out_channels=2, model_channels=32,
               num_res_blocks=1, channel_mult=(1, 2),
               attention_resolutions=(), num_heads=2)
    x = jnp.zeros((1, 16, 16, 4))
    params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 20)
    rsched = schedules.respace(betas, schedules.space_timesteps(20, "5"))
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      learn_sigma=True)
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))

    out_bf16 = make_sample_fn(m.apply, rsched, task, "ddim")(
        params, cond, jax.random.PRNGKey(2))
    out_int8 = make_sample_fn(wrap_quantized(m.apply), rsched, task, "ddim")(
        params, cond, jax.random.PRNGKey(2))
    assert out_int8.shape == out_bf16.shape
    assert np.isfinite(np.asarray(out_int8)).all()
    # same RNG: the chains agree up to accumulated quantization noise
    diff = float(jnp.max(jnp.abs(out_int8 - out_bf16)))
    assert diff < 0.5, diff


@pytest.mark.slow  # ~5 min: Trainer init + three sampler-scan compiles
def test_trainer_set_sampler_int8(tmp_path, monkeypatch):
    """Trainer.set_sampler(int8=True) routes the sampling path through
    wrap_quantized and int8=False restores the exact bf16 path.

    Execution of genuinely-quantized convs is covered by
    test_int8_sampling_chain; here the trainer model is 16-channel, below
    min_channels=32, so no conv is swapped and the int8 path must be
    BITWISE identical to bf16 — which proves the wiring executes end to
    end without paying the int8 CPU-lowering compile cost (the test
    conftest's --xla_backend_optimization_level=0 makes unoptimized int8
    convs ~10x slower than bf16 on CPU)."""
    from dsdiff_tpu.data.synthetic import make_structured_dataset
    from dsdiff_tpu.train import Config, Trainer

    calls = []
    import dsdiff_tpu.ops.quant as quant_mod
    real_wrap = quant_mod.wrap_quantized
    monkeypatch.setattr(
        quant_mod, "wrap_quantized",
        lambda fn, **kw: calls.append(kw) or real_wrap(fn, **kw))

    make_structured_dataset(tmp_path / "d", n_cases=4, n_slices=2, hw=16,
                            seed=0)
    cfg = Config.wrap(dict(
        net_mode="ds_diff_gaussian",
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(tmp_path / "d"), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=4, fold_idx=0,
        diffusion_steps=50,
        parameterization="eps", loss_type="l2",
        disentangle_distance="eu", contrast_lambda=0.1,
        unet_config={"params": {
            "model_channels": 16, "num_res_blocks": 1,
            "channel_mult": [1, 2], "attention_resolutions": [],
            "num_heads": 2}},
        num_epochs=1, lr=1e-4,
        sampler_setting={"sampler": "ddim", "sample_steps": 3},
        seed=0, bf16=False, log_images=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    cond = jnp.asarray(next(iter(tr.val_loader.epoch(0)))["image"])
    rng = jax.random.PRNGKey(0)
    base = tr.sample_fn(tr.state.ema_params, cond, rng)
    tr.set_sampler(int8=True)
    assert calls, "set_sampler(int8=True) did not route via wrap_quantized"
    quant = tr.sample_fn(tr.state.ema_params, cond, rng)
    # no conv clears min_channels=32 at 16ch -> interception is a no-op
    np.testing.assert_array_equal(np.asarray(base), np.asarray(quant))
    n_calls = len(calls)
    tr.set_sampler(int8=False)
    assert len(calls) == n_calls, "int8=False must not wrap"
    back = tr.sample_fn(tr.state.ema_params, cond, rng)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(back))
    tr.ckpt.close()


def test_flagship_forward_under_int8():
    """A small DSUNet forward under int8_convs stays close to bf16."""
    from dsdiff_tpu.models.dsunet import DSUNet

    m = DSUNet(in_channels=4, out_channels=2, model_channels=32,
               num_res_blocks=1, channel_mult=(1, 2),
               attention_resolutions=(8,), num_head_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([10.0, 500.0])
    params = m.init(jax.random.PRNGKey(2), x, t)
    # the output head is zero-initialized; jitter every param so the
    # comparison isn't 0 vs 0 (rel would be NaN)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    base, _ = m.apply(params, x, t)
    with int8_convs(min_channels=32):
        quant, feats = m.apply(params, x, t)
    assert quant.shape == base.shape
    rel = float(jnp.linalg.norm(quant - base) / jnp.linalg.norm(base))
    assert rel < 0.25, rel
    assert np.isfinite(np.asarray(quant)).all()
