"""Training-stack tests: state/EMA, schedule sampler, config, checkpoints,
and the tiny end-to-end fit->validate->predict->resume loop on the 8-device
CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.train import (
    Config, TaskConfig, TrainState, cosine_lr, load_run_config, make_optimizer,
    merge,
)
from dsdiff_tpu.train import schedule_sampler as ss


def test_train_state_ema_warmup():
    params = {"w": jnp.ones((4,))}
    tx = make_optimizer(1e-2)
    st = TrainState.create(lambda p, x: x, params, tx, ema_decay=0.9999)
    grads = {"w": jnp.ones((4,))}
    st2 = st.apply_gradients(grads)
    assert int(st2.step) == 1
    # step 0: decay = min(0.9999, 1/10) = 0.1 -> ema ~ params
    np.testing.assert_allclose(
        np.asarray(st2.ema_params["w"]),
        0.1 * np.asarray(st.params["w"]) + 0.9 * np.asarray(st2.params["w"]),
        rtol=1e-5,
    )


def test_uniform_sampler():
    st = ss.make_schedule_sampler("uniform", 100)
    t, w = ss.sample_t(st, jax.random.PRNGKey(0), 64)
    assert t.shape == (64,) and int(t.min()) >= 0 and int(t.max()) < 100
    np.testing.assert_allclose(np.asarray(w), 1.0)
    st2 = ss.update_state(st, t, jnp.ones((64,)))
    assert st2 is st  # no-op


def test_loss2_sampler_warmup_and_importance():
    T, hist = 10, 3
    st = ss.loss2_init(T, hist)
    rng = jax.random.PRNGKey(0)
    # before warmup: uniform weights
    t, w = ss.sample_t(st, rng, 8)
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)
    # fill history: big losses at t=0, small elsewhere
    for i in range(hist * T):
        tt = jnp.array([i % T])
        loss = jnp.array([10.0 if (i % T) == 0 else 0.1])
        st = ss.update_state(st, tt, loss)
    assert bool(jnp.all(st.loss_counts == hist))
    t, w = ss.sample_t(st, rng, 512)
    frac_t0 = float(jnp.mean((t == 0).astype(jnp.float32)))
    assert frac_t0 > 0.5  # importance-sampled toward the lossy timestep
    # weights are 1/(T p): smaller for oversampled t
    assert float(w[t == 0].mean()) < 1.0


def test_sampler_state_jittable():
    st = ss.loss2_init(10, 3)

    @jax.jit
    def f(s, t, l):
        return ss.update_state(s, t, l)

    out = f(st, jnp.array([1, 1]), jnp.array([0.5, 0.7]))
    assert float(out.loss_history[1].max()) > 0


def test_config_merge_and_paths(tmp_path):
    a = {"x": 1, "nested": {"a": 1, "b": 2}}
    b = {"nested": {"b": 3, "c": 4}, "y": 5}
    m = merge(a, b)
    assert m.x == 1 and m.y == 5
    assert m.nested.a == 1 and m.nested.b == 3 and m.nested.c == 4
    assert m.get_path("nested.c") == 4
    assert m.get_path("nested.zzz", "dflt") == "dflt"

    run = tmp_path / "run.yaml"
    model = tmp_path / "model.yaml"
    run.write_text("lr: 0.1\nconfig_opt: model.yaml\n")
    model.write_text("lr: 0.2\nmodel:\n  name: unet\n")
    cfg = load_run_config(run)
    assert cfg.lr == 0.2  # model config overrides
    assert cfg.model.name == "unet"


def test_cosine_lr_schedule():
    sched = cosine_lr(1e-3, 100, warmup_steps=10, min_lr=1e-6)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(100)) < 1e-5


def _tiny_dataset(tmp_path, hw=16, keys=("A", "B")):  # 4 cases x 8 slices
    from dsdiff_tpu.data import h5store

    rng = np.random.default_rng(0)
    for c in range(4):
        for i in range(8):
            for split in ("tr", "ts"):
                h5store.write_slice(
                    tmp_path / "data" / f"images_{split}_{hw}"
                    / f"case{c}" / f"layer_{i}.h5",
                    {k: rng.normal(size=(hw, hw)).astype(np.float32)
                     for k in keys},
                )
    return tmp_path / "data"


@pytest.mark.slow
def test_end_to_end_fit_predict_resume(tmp_path):
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path)
    cfg = Config.wrap(dict(
        net_mode="ddpm", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, learn_sigma=False, parameterization="eps",
        disentangle_distance=None,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    assert tr.mesh.devices.size == 8
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1, val_every_epochs=1)
    assert step >= 1
    # per-val-epoch image dumps (trainer_ds_diff.py:649-696 log_images)
    img_dirs = sorted((tmp_path / "run" / "images").glob("step_*"))
    assert img_dirs, "no validation image dumps"
    assert (img_dirs[-1] / "samples.png").exists()
    assert (img_dirs[-1] / "denoise_row.png").exists()
    out_dir, _ = tr.predict()
    preds = sorted(p.name for p in out_dir.glob("*_pred.nii.gz"))
    assert len(preds) == 4

    tr2 = Trainer(cfg, tmp_path / "run")
    tr2.state, tr2.sampler_state = tr2.ckpt.restore(
        tr2.state, tr2.sampler_state)
    assert int(jax.device_get(tr2.state.step)) == step
    tr.ckpt.close()
    tr2.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_latent_pipeline_e2e(tmp_path):
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=32)
    cfg = Config.wrap(dict(
        net_mode="latent", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=32,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, learn_sigma=False, parameterization="eps",
        disentangle_distance=None, scale_by_std=True,
        first_stage={"params": {"ch": 8, "ch_mult": [1, 2],
                                "num_res_blocks": 1, "z_channels": 2,
                                "embed_dim": 2}},
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    assert tr.first_stage is not None
    assert tr.in_ch == 2 * (1 + 1)  # z*(1+n_cond)
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=1)
    out_dir, _ = tr.predict()
    preds = list(out_dir.glob("*_pred.nii.gz"))
    assert len(preds) == 4
    # decoded predictions are image-resolution
    from dsdiff_tpu.data.nifti import read_nifti
    vol = read_nifti(preds[0])
    assert vol.data.shape[0] == 32
    tr.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_vae_gan_loop(tmp_path):
    from dsdiff_tpu.train.vae_loop import VaeTrainer

    data = _tiny_dataset(tmp_path, hw=16)
    cfg = Config.wrap(dict(
        train_keys=["A", "B"], h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, num_epochs=1, lr=1e-4, seed=0, bf16=False,
        disc_start=0, perceptual_weight=0.0, disc_channels=8,
        disc_num_layers=2,
        first_stage={"params": {"ch": 8, "ch_mult": [1, 2],
                                "num_res_blocks": 1, "z_channels": 2,
                                "embed_dim": 2}},
    ))
    t = VaeTrainer(cfg, tmp_path / "run")
    step = t.fit(max_steps=2, log_every=1)
    assert step == 2
    assert t.ckpt.latest_step() == 2
    rec = t.reconstruction_metrics(max_batches=1)
    assert set(rec) == {"rec_ssim", "rec_psnr", "rec_mae"}
    assert np.isfinite(list(rec.values())).all()
    t.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_palette_pipeline_e2e(tmp_path):
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=16)
    cfg = Config.wrap(dict(
        net_mode="palette", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        disentangle_distance=None,
        palette={"train_schedule": {"n_timestep": 20},
                 "test_schedule": {"n_timestep": 10}},
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=1)
    assert step == 2
    tr.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_disc_diff_pipeline_e2e(tmp_path):
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=16, keys=("t1", "t2", "dwi", "ce"))
    cfg = Config.wrap(dict(
        net_mode="disc_diff", train_keys=["t1", "t2", "dwi", "ce"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, learn_sigma=True, parameterization="eps",
        disentangle_distance="eu", contrast_lambda=0.1,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1,
                                "use_scale_shift_norm": True}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "dpm++", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=1)
    assert step == 2
    # com/dist disentangle metric present
    logs = (tmp_path / "run" / "logs" / "progress.jsonl").read_text()
    assert "loss_disen" in logs
    tr.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_dit_pipeline_e2e(tmp_path):
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=16)
    cfg = Config.wrap(dict(
        net_mode="dit", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=16, init_size=32,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, learn_sigma=False, parameterization="eps",
        disentangle_distance=None,
        ViT_config={"params": {"input_size": 32, "patch_size": 8,
                               "hidden_size": 32, "depth": 1,
                               "num_heads": 2}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=10**9)
    assert step == 2
    tr.ckpt.close()


@pytest.mark.slow
def test_shannon_curriculum_warmup_e2e(tmp_path):
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=16)
    cfg = Config.wrap(dict(
        net_mode="ddpm", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, parameterization="eps",
        disentangle_distance=None,
        shannon=True, shannon_warmup_steps=1,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=10**9)
    assert step == 2
    tr.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_ds_diff_split_pipeline_e2e(tmp_path):
    """DSUNetSplit net_mode: training full-forward + cached-cond sampling."""
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=16, keys=("a", "al", "l", "gt"))
    cfg = Config.wrap(dict(
        net_mode="ds_diff_split", train_keys=["a", "al", "l", "gt"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, learn_sigma=True, parameterization="v",
        disentangle_distance="eu", contrast_lambda=0.1,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1,
                                "use_scale_shift_norm": True}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=1)
    assert step == 2
    out_dir, _ = tr.predict()
    assert len(list(out_dir.glob("*_pred.nii.gz"))) == 4
    tr.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_cfg_sampling_pipeline(tmp_path):
    """cond_dropout training + cfg_scale guided sampling run end-to-end."""
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, hw=16)
    cfg = Config.wrap(dict(
        net_mode="ddpm", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, parameterization="eps",
        disentangle_distance=None, cond_dropout=0.2,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 5,
                         "cfg_scale": 2.0},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    assert tr.task.cond_dropout == 0.2 and tr.task.cfg_scale == 2.0
    step = tr.fit(num_epochs=1, max_steps=1, log_every=1,
                  val_every_epochs=1)
    assert step == 1
    tr.ckpt.close()


@pytest.mark.slow
@pytest.mark.slow
def test_flagship_image_dumps_with_heatmaps(tmp_path):
    """ds_diff_gaussian validation dumps sample grid, denoise row AND the
    contrastive heatmaps (trainer_use_gaussian_diff.py:472-475)."""
    from dsdiff_tpu.train import Trainer

    data = _tiny_dataset(tmp_path, keys=("a", "al", "l", "gt"))
    cfg = Config.wrap(dict(
        net_mode="ds_diff_gaussian", train_keys=["a", "al", "l", "gt"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, learn_sigma=True, parameterization="v",
        disentangle_distance="eu", contrast_lambda=0.5,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [2],
                                "num_heads": 2}},
        num_epochs=1, lr=1e-3,
        sampler_setting={"sampler": "ddim", "sample_steps": 4},
        seed=3, bf16=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    tr.fit(num_epochs=1, max_steps=1, log_every=1, val_every_epochs=1)
    img_dirs = sorted((tmp_path / "run" / "images").glob("step_*"))
    assert img_dirs
    files = {p.name for p in img_dirs[-1].iterdir()}
    assert "samples.png" in files and "denoise_row.png" in files
    assert "heatmap_c_s.png" in files and "heatmap_s_a_l.png" in files
    tr.ckpt.close()
