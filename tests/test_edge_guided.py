"""Edge-guided (EG) DSUNet path — the thesis's headline ablation axis
(model_architecture_thesis.md:385-392; edge concat onto the noise stream,
UNet_DS_Diff/49_model.py:296,376,710-713).

Round-4 verdict: `use_edge` through the Trainer had NEVER worked — DSUNet
hard-rejected the 5-channel input at init. These tests pin the capability:
unit-level forward shapes for both stream modes and both DSUNet variants,
cached-vs-full exactness under cond_t_ref, and a fast Trainer e2e
(fit 2 steps -> validate) so the path cannot silently rot again.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.models import DSUNet
from dsdiff_tpu.models.dsunet_cached import DSUNetSplit, make_cached_denoiser

TINY = dict(
    model_channels=8, out_channels=1, num_res_blocks=1,
    attention_resolutions=(), channel_mult=(1, 2), num_heads=1,
    dtype=jnp.float32,
)


@pytest.mark.parametrize("stream_mode", ["sequential", "vmap"])
def test_dsunet_edge_forward(stream_mode):
    # 5 channels = [noise, a, al, l, edge]
    model = DSUNet(in_channels=5, use_edge=True,
                   stream_mode=stream_mode, **TINY)
    x = jnp.ones((2, 16, 16, 5))
    t = jnp.zeros((2,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    out, feats = model.apply(params, x, t)
    assert out.shape == (2, 16, 16, 1)
    assert feats["style"].shape[0] == 3
    # the noise-stream stem consumes 2 input channels, conditions 1
    # (sequential mode matches the reference's widened noise stem exactly)
    if stream_mode == "sequential":
        enc0 = params["params"]["encoder_0"]
        enc1 = params["params"]["encoder_1"]

        # find the first conv kernel of each encoder (the stem)
        def first_kernel(enc):
            for k in sorted(enc):
                node = enc[k]
                if isinstance(node, dict) and "kernel" in node:
                    return node["kernel"]
            for k in sorted(enc):
                if isinstance(enc[k], dict):
                    got = first_kernel(enc[k])
                    if got is not None:
                        return got
            return None

        k0, k1 = first_kernel(enc0), first_kernel(enc1)
        assert k0.shape[-2] == 2 and k1.shape[-2] == 1


def test_dsunet_edge_actually_used():
    """The edge channel must flow into the trunk (it feeds the noise stem).

    The OutHead's final conv is zero-initialized, so fresh-params *outputs*
    are identically zero — probe the noise stream's bottleneck features
    (n_style_content carries the noise-stream style/content halves) instead.
    """
    model = DSUNet(in_channels=5, use_edge=True, **TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 5)),
                    jnp.float32)
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, t)
    _, feats_a = model.apply(params, x, t)
    x2 = x.at[..., 4].set(1.0 - x[..., 4])
    _, feats_b = model.apply(params, x2, t)
    d_noise = float(jnp.abs(feats_a["n_style_content"]
                            - feats_b["n_style_content"]).max())
    assert d_noise > 1e-6, "edge channel does not reach the noise stream"
    # conditions are untouched by the edge: their styles must be identical
    d_cond = float(jnp.abs(feats_a["style"] - feats_b["style"]).max())
    assert d_cond == 0.0, "edge leaked into the condition streams"


def test_dsunet_split_edge_cached_exact():
    """use_edge + cond_t_ref: cached denoiser == full forward exactly."""
    model = DSUNetSplit(
        in_channels=5, use_edge=True, cond_t_ref=5.0,
        model_channels=8, out_channels=1, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_heads=1,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)), jnp.float32)
    t = jnp.full((2,), 3.0)
    params = model.init(jax.random.PRNGKey(0), x, t)
    full, _ = model.apply(params, x, t)
    # trainer cond layout: [a, al, l, edge]
    cond = jnp.concatenate([x[..., 1:4], x[..., 4:5]], axis=-1)
    denoise = make_cached_denoiser(model, params, cond)
    cached = denoise(x[..., 0:1], t)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               rtol=2e-5, atol=2e-5)


def test_trainer_use_edge_e2e(tmp_path):
    """The round-4 repro: `use_edge: sobel` + ds_diff_gaussian through the
    Trainer — init, 2 fit steps, one sampled validation batch."""
    from dsdiff_tpu.train import Config, Trainer
    from tests.test_train import _tiny_dataset

    data = _tiny_dataset(tmp_path, hw=16, keys=("A", "B", "C", "GT"))
    cfg = Config.wrap(dict(
        net_mode="ds_diff_gaussian", train_keys=["A", "B", "C", "GT"],
        use_edge="sobel",
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        # cosine: the OpenAI 'linear'(scaled) schedule is degenerate at
        # tiny T (scale=1000/T pushes beta past 1 -> NaN tables)
        diffusion_steps=10, noise_schedule="cosine",
        learn_sigma=True, parameterization="v",
        disentangle_distance="eu", contrast_lambda=0.1,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 2},
        seed=3, bf16=False, log_images=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    assert tr.in_ch == 5 and tr.model.use_edge
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=10 ** 9, val_on_done=False)
    assert step == 2
    m = tr.validate(max_batches=1)
    assert np.isfinite(m["ssim"]) and np.isfinite(m["mae"])
    tr.ckpt.close()
