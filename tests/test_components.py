"""Tests for the wider component set: palette, PLMS/thresholding, curriculum,
SUV, seg/encoder networks, weight surgery, profiling, VAE GAN steps."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.core import palette, process, sampling, schedules


def test_palette_gamma_schedule_tables():
    gs = palette.GammaSchedule.create(n_timestep=100, linear_start=1e-6,
                                      linear_end=0.01)
    b = np.asarray(gs.betas)
    g = np.cumprod(1 - b)
    np.testing.assert_allclose(np.asarray(gs.gammas), g, rtol=1e-5)
    # q_sample at gamma=1 returns y0
    y0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(y0)
    out = palette.q_sample(jnp.ones((2,)), y0, noise)
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_palette_oracle_ddim():
    gs = palette.GammaSchedule.create(n_timestep=100, linear_start=1e-4,
                                      linear_end=0.02)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1)) * 0.5
    gam = jnp.asarray(gs.gammas)

    def oracle(x_with_cond, gamma):
        y = x_with_cond[..., -1:]
        g = gamma.reshape(-1, 1, 1, 1)
        return (y - jnp.sqrt(g) * x0) / jnp.sqrt(1 - g)

    cond = jnp.zeros((2, 8, 8, 1))
    out = palette.ddim_sample_loop(gs, oracle, cond, jax.random.PRNGKey(1),
                                   ddim_steps=10, clip_denoised=False)
    # the chain ends at gammas[0] = 1-beta0 (reference behavior), leaving
    # sqrt(beta0)-scale residual noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.05)


def test_plms_oracle():
    T = 100
    betas = schedules.make_beta_schedule("linear", T)
    r = schedules.respace(betas, schedules.space_timesteps(T, "10"))
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1)) * 0.5
    inv = np.zeros(T, np.int32)
    for i, o in enumerate(np.asarray(r.timestep_map)):
        inv[o] = i
    invj = jnp.asarray(inv)

    def oracle(xt, tm):
        return process.predict_eps_from_x0(
            r, xt, invj[tm.astype(jnp.int32)], x0
        )

    out = sampling.plms_sample_loop(
        r, oracle, jax.random.normal(jax.random.PRNGKey(1), x0.shape),
        clip_denoised=False,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-3)


def test_dynamic_threshold():
    x = jnp.concatenate(
        [jnp.full((1, 4, 4, 1), 5.0), jnp.full((1, 4, 4, 1), 0.5)]
    )
    out = sampling.dynamic_threshold(x)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-6
    # small values untouched
    np.testing.assert_allclose(np.asarray(out[1]), 0.5, rtol=1e-5)


def test_entropy_curriculum(tmp_path):
    from dsdiff_tpu.data import h5store
    from dsdiff_tpu.data.curriculum import EntropyCurriculum, shannon_entropy
    from dsdiff_tpu.data.pipeline import SliceDataset

    rng = np.random.default_rng(0)
    # constant slices (low entropy) and noisy slices (high entropy)
    for i in range(6):
        easy = i < 3
        arr = (np.zeros((16, 16)) if easy
               else rng.normal(size=(16, 16))).astype(np.float32)
        h5store.write_slice(
            tmp_path / "images_tr_16" / "c0" / f"layer_{i}.h5",
            {"A": arr, "B": arr},
        )
    assert shannon_entropy(np.zeros((8, 8))) == 0.0
    ds = SliceDataset(tmp_path, split="images_tr_16", keys=["A", "B"],
                      pad_to=1)
    cur = EntropyCurriculum(ds, seed=0)
    assert cur.lowest < cur.highest
    g = np.random.default_rng(1)
    early = cur.sample_indices(8, step=0, warmup_steps=100, rng=g)
    late = cur.sample_indices(8, step=100, warmup_steps=100, rng=g)
    # early batches come from the low-entropy bucket, late from high
    low_bucket = set(cur.buckets[cur.lowest])
    assert set(early) <= low_bucket
    assert set(late).isdisjoint(low_bucket)
    b = cur.batch(8, 0, 100, g)
    assert b["image"].shape[0] == 8


def test_suv_math(tmp_path):
    from dsdiff_tpu.eval import suv

    params = {
        "PatientWeight": 70.0,
        "RadionuclideTotalDose": 3.7e8,
        "RadionuclideHalfLife": 6586.2,
        "RadiopharmaceuticalStartTime": "100000",
        "SeriesTime": "110000",  # 1h later
        "RescaleSlope": 1.0,
        "RescaleIntercept": 0.0,
    }
    act = np.full((4, 4), 1000.0)
    out = suv.suv_from_prediction(act, params)
    import math

    dose = 3.7e8 * math.exp(-math.log(2) / 6586.2 * 3600)
    np.testing.assert_allclose(out, 1000.0 * 70000.0 / dose, rtol=1e-6)
    # inverse normalize
    inv = suv.inverse_normalize(np.array([-1.0, 0.0, 1.0]), 0.0, 200.0)
    np.testing.assert_allclose(inv, [0.0, 100.0, 200.0])
    rp = suv.suv_report({"c1": out}, tmp_path / "suv.csv")
    assert "c1" in rp.read_text()


def test_ffparser_and_segunet():
    from dsdiff_tpu.models import FFParser, SegUNet

    m = FFParser(h=16, w=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    p = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(p, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))

    seg = SegUNet(in_channels=1, num_classes=3, base_features=8, num_pool=2)
    x = jnp.zeros((2, 32, 32, 1))
    p = seg.init(jax.random.PRNGKey(0), x)
    out = seg.apply(p, x)
    assert out.shape == (2, 32, 32, 3)


def test_sliding_window_inference():
    from dsdiff_tpu.models import SegUNet, sliding_window_inference

    seg = SegUNet(in_channels=1, num_classes=2, base_features=4, num_pool=1)
    p = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
    vol = np.random.default_rng(0).normal(size=(24, 24, 3, 1)).astype(
        np.float32)
    labels = sliding_window_inference(
        seg.apply, p, vol, tile=16, overlap=0.5, num_classes=2, batch=4
    )
    assert labels.shape == (24, 24, 3)
    assert set(np.unique(labels)) <= {0, 1}


@pytest.mark.slow
def test_encoder_unet_and_guidance():
    from dsdiff_tpu.models import EncoderUNet, classifier_gradient

    for pool in ["adaptive", "attention"]:
        m = EncoderUNet(num_classes=3, model_channels=16, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        pool=pool)
        x = jnp.zeros((2, 16, 16, 1))
        t = jnp.zeros((2,))
        p = m.init(jax.random.PRNGKey(0), x, t)
        logits = m.apply(p, x, t)
        assert logits.shape == (2, 3)
        g = classifier_gradient(m.apply, p, x, t, jnp.array([0, 1]), 2.0)
        assert g.shape == x.shape


def test_weight_surgery():
    from dsdiff_tpu.train.surgery import filtered_load, fit_tensor, make_it_fit

    old = np.arange(6, dtype=np.float32).reshape(2, 3)
    # reference make_it_fit (ddpm.py:250-260): modulo-cycle both axes, then
    # divide by its ones-INITIALIZED input-axis use counter — each input
    # channel used once => counter 1+1=2, so values come back halved
    out = fit_tensor(old, (4, 3))
    np.testing.assert_allclose(out[2:], old / 2.0)  # cycled rows
    np.testing.assert_allclose(out[:2], old / 2.0)
    out2 = fit_tensor(old, (2, 2))
    np.testing.assert_allclose(out2, old[:, :2] / 2.0)
    # input-axis growth: channel 0 used twice -> counter 3, channel 1 -> 2
    out3 = fit_tensor(np.ones((2, 2), np.float32), (2, 3))
    np.testing.assert_allclose(out3[:, 0], 1 / 3.0)
    np.testing.assert_allclose(out3[:, 1], 1 / 2.0)
    np.testing.assert_allclose(out3[:, 2], 1 / 3.0)
    # rank-1 params cycle without normalization (reference len(shape)==1 arm)
    np.testing.assert_allclose(
        fit_tensor(np.array([1.0, 2.0], np.float32), (4,)),
        [1.0, 2.0, 1.0, 2.0],
    )

    target = {"a": {"w": np.zeros((4, 3), np.float32)},
              "b": np.ones((2,), np.float32)}
    loaded = {"a": {"w": old}}
    fitted = make_it_fit(loaded, target)
    np.testing.assert_allclose(fitted["a"]["w"][:2], old / 2.0)
    np.testing.assert_allclose(fitted["b"], 1.0)  # kept fresh init

    fl = filtered_load({"a": {"w": np.full((4, 3), 7.0)}, }, target,
                       ignore_prefixes=())
    np.testing.assert_allclose(fl["a"]["w"], 7.0)


def test_profiling_utils():
    from dsdiff_tpu.utils import profiling

    with profiling.profile_scope("unit"):
        pass
    assert "unit" in profiling.scope_totals()
    flops = profiling.compiled_flops(
        lambda a, b: a @ b, jnp.zeros((64, 64)), jnp.zeros((64, 64))
    )
    assert flops > 0


@pytest.mark.slow
def test_vae_gan_steps():
    from dsdiff_tpu.models import AutoencoderKL, PatchDiscriminator
    from dsdiff_tpu.train.state import TrainState, make_optimizer
    from dsdiff_tpu.train.vae_trainer import VaeGanConfig, make_vae_steps

    vae = AutoencoderKL(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=2, embed_dim=2)
    disc = PatchDiscriminator(base_channels=8, n_layers=2)
    x = jnp.zeros((2, 16, 16, 1))
    rng = jax.random.PRNGKey(0)
    vs = TrainState.create(vae.apply, vae.init(rng, x, rng),
                           make_optimizer(1e-4))
    ds = TrainState.create(disc.apply, disc.init(jax.random.PRNGKey(1), x),
                           make_optimizer(1e-4))
    cfg = VaeGanConfig(disc_start=0)
    ae_step, d_step = make_vae_steps(vae.apply, disc.apply, cfg)
    batch = {"image": jax.random.normal(rng, (2, 16, 16, 1)) * 0.5}
    logvar = jnp.zeros(())
    vs, logvar, m = ae_step(vs, logvar, ds.params, batch, rng)
    assert np.isfinite(float(m["ae_loss"]))
    assert float(m["d_weight"]) >= 0
    ds, dm = d_step(ds, vs.params, batch, rng)
    assert np.isfinite(float(dm["disc_loss"]))
    assert int(vs.step) == 1 and int(ds.step) == 1


def test_modulated_resblock():
    from dsdiff_tpu.models.layers import ModulatedResBlock

    m = ModulatedResBlock(out_channels=16)
    x = jnp.zeros((2, 8, 8, 8))
    emb = jnp.ones((2, 32))
    ctx = jnp.zeros((2, 8, 8, 32))
    p = m.init(jax.random.PRNGKey(0), x, emb, ctx)
    out = m.apply(p, x, emb, ctx)
    assert out.shape == (2, 8, 8, 16)
    # zero-init out conv + zero x + 1x1 skip of zeros -> output zero
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_npy_dataset_and_cache(tmp_path):
    from dsdiff_tpu.data import h5store
    from dsdiff_tpu.data.npy_dataset import NpyVolumeDataset, build_volume_cache

    rng = np.random.default_rng(0)
    for c in range(2):
        for i in range(4):
            h5store.write_slice(
                tmp_path / "h5" / "images_tr_16" / f"c{c}" / f"layer_{i}.h5",
                {k: rng.normal(size=(16, 16)).astype(np.float32)
                 for k in ("t1", "ce")},
            )
    paths = build_volume_cache(tmp_path / "h5", "images_tr_16",
                               ["t1", "ce"], tmp_path / "npy")
    ds = NpyVolumeDataset(paths, gt_key="ce", slice_range=(1, 6),
                          pad_to=16)
    assert len(ds) == 5
    row = ds.get(0, np.random.default_rng(1))
    assert row["image"].shape == (16, 16, 1)
    assert row["target"].shape == (16, 16, 1)


def test_lvlb_weights():
    from dsdiff_tpu.core.process import lvlb_weights, training_losses
    from dsdiff_tpu.core.schedules import DiffusionSchedule

    s = DiffusionSchedule.named("linear", 50)
    w = lvlb_weights(s, "eps")
    assert w.shape == (50,)
    assert float(w[0]) == float(w[1])  # t=0 copied from t=1
    assert np.all(np.isfinite(np.asarray(w)))
    np.testing.assert_allclose(np.asarray(lvlb_weights(s, "v")), 1.0)
    # elbo term appears in training losses
    x0 = jnp.zeros((2, 8, 8, 1))
    noise = jnp.ones_like(x0)
    terms, _ = training_losses(
        s, lambda xt, tm: jnp.zeros_like(xt), x0, jnp.array([0, 10]), noise,
        parameterization="eps", loss_type="l2", elbo_weight=0.1,
    )
    assert "elbo" in terms


def test_composite_distance():
    from dsdiff_tpu.core.composite_loss import composite_distance

    fn = composite_distance({"l1": 1.0, "l2": 2.0})
    v = float(fn(jnp.zeros((1, 16, 16, 1)), jnp.ones((1, 16, 16, 1))))
    np.testing.assert_allclose(v, 1.0 + 2.0, rtol=1e-6)
    fn2 = composite_distance({"ssim": 1.0})
    x = jnp.broadcast_to(
        jnp.linspace(0, 1, 32 * 32).reshape(1, 32, 32, 1), (1, 32, 32, 1))
    assert float(fn2(x, x)) < 1e-5


@pytest.mark.slow
def test_adversarial_disentangle_steps():
    from dsdiff_tpu.core.schedules import DiffusionSchedule
    from dsdiff_tpu.models import DSUNet
    from dsdiff_tpu.train.adversarial import (
        AdvConfig, ContentDiscriminator, make_adversarial_steps,
    )
    from dsdiff_tpu.train import schedule_sampler as ss
    from dsdiff_tpu.train.state import TrainState, make_optimizer
    from dsdiff_tpu.train.step import TaskConfig

    model = DSUNet(in_channels=4, model_channels=16, out_channels=1,
                   num_res_blocks=1, attention_resolutions=(),
                   channel_mult=(1, 2), num_heads=2)
    x = jnp.zeros((2, 16, 16, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)))
    state = TrainState.create(model.apply, params, make_optimizer(1e-4))

    disc = ContentDiscriminator(n_streams=3, base_channels=8)
    half = 16 * 2 // 2  # deepest channels / 2
    dp = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, half)))
    disc_state = TrainState.create(disc.apply, dp, make_optimizer(1e-4))

    sched = DiffusionSchedule.create(
        schedules.make_beta_schedule("linear", 10))
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      feature_kind="ds", disen_lambda=0.1)
    model_step, disc_step = make_adversarial_steps(
        task, sched, disc.apply, AdvConfig(adv_lambda=0.1))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3)),
        "target": jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 1)),
    }
    sampler = ss.uniform_init(10)
    rng = jax.random.PRNGKey(4)
    state, sampler, m = model_step(state, sampler, disc_state.params,
                                   batch, rng)
    assert np.isfinite(float(m["loss"])) and "loss_adv" in m
    disc_state, dm = disc_step(disc_state, state, batch, rng)
    assert 0.0 <= float(dm["disc_acc"]) <= 1.0
    assert int(state.step) == 1 and int(disc_state.step) == 1
