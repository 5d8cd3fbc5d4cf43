"""Fold/unfold split-input tests (LatentDiffusion split_input_params,
ddpm.py:690-927) and progressive denoising (ddpm.py:1117)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsdiff_tpu.core import patching


def test_delta_border_golden():
    d = patching.delta_border(5, 5)
    assert d[0, 0] == 0.0 and d[0, 2] == 0.0
    assert d[2, 2] == 0.5  # center
    np.testing.assert_allclose(d[1, 2], 0.25)


def test_fold_unfold_identity():
    """Identity tile function -> exact reconstruction (weighted average of
    identical overlapping values), any weighting."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    out = patching.patched_apply(
        lambda tiles, t: tiles, x, jnp.zeros((2,)), (16, 16), (8, 8)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_patched_apply_pointwise_equals_global():
    """A pointwise denoiser commutes with fold/unfold: patched == direct."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 24, 24, 2)), jnp.float32)

    def fn(tiles, t):
        return 0.5 * tiles + 0.1

    out = patching.patched_apply(fn, x, jnp.zeros((1,)), (8, 8), (4, 4))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(0.5 * x + 0.1), rtol=1e-5, atol=1e-6
    )


def test_cond_tiling_concat():
    """cond channels are tiled jointly and concatenated per tile
    (apply_model unfolds the concatenated input, ddpm.py:857-927)."""
    x = jnp.ones((1, 16, 16, 1))
    cond = 2.0 * jnp.ones((1, 16, 16, 2))

    def fn(tiles, t):
        assert tiles.shape[-1] == 3
        # echo the mean of the cond channels
        return jnp.mean(tiles[..., 1:], axis=-1, keepdims=True)

    out = patching.patched_apply(fn, x, jnp.zeros((1,)), (8, 8), (8, 8),
                                 cond=cond)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)


def test_sample_fn_split_input_matches_unpatched():
    """make_sample_fn(patch_params=...) runs the full DDIM chain through the
    tiled model; for a pointwise model it matches the unpatched sampler
    bit-for-bit."""
    from dsdiff_tpu.core.schedules import DiffusionSchedule
    from dsdiff_tpu.train.step import TaskConfig, make_sample_fn

    sched = DiffusionSchedule.named("linear", 5)
    task = TaskConfig(parameterization="eps", learn_sigma=False)

    def apply_fn(params, xin, t, **kw):
        # pointwise eps model over [x, cond] tiles
        return 0.3 * xin[..., :1] + 0.05 * jnp.sum(
            xin[..., 1:], axis=-1, keepdims=True
        )

    cond = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 16, 16, 2)), jnp.float32
    )
    rng = jax.random.PRNGKey(0)
    plain = make_sample_fn(apply_fn, sched, task, "ddim", out_channels=1)
    patched = make_sample_fn(
        apply_fn, sched, task, "ddim", out_channels=1,
        patch_params={"ks": (8, 8), "stride": (4, 4)},
    )
    a = np.asarray(plain({}, cond, rng))
    b = np.asarray(patched({}, cond, rng))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_trainer_progressive_denoise(tmp_path):
    from dsdiff_tpu.train.config import Config
    from dsdiff_tpu.train.trainer import Trainer

    cfg = Config.wrap(dict(
        net_mode="ddpm", diffusion_steps=10, image_size=16, init_size=16,
        learn_sigma=False, parameterization="eps",
        disentangle_distance=None,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        sampler_setting={"sampler": "ddim", "sample_steps": 4},
        num_epochs=1, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    cond = np.zeros((2, 16, 16, 3), np.float32)
    final, frames = tr.progressive_denoise(cond)
    assert frames.shape == (4, 2, 16, 16, 1)
    assert final.shape == (2, 16, 16, 1)
    # DDIM's final update at t=0 returns the last x0 prediction
    np.testing.assert_allclose(np.asarray(final), np.asarray(frames[-1]),
                               rtol=1e-5)
