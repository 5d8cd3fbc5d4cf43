"""Multi-chip sharding correctness on the virtual 8-device CPU mesh.

The capability the reference lacks (SURVEY.md §4): verify that the GSPMD-
sharded training step is numerically equivalent to the single-device step,
that ZeRO-style fsdp parameter sharding executes, and that explicit noise
injection makes outputs bit-deterministic (the BASELINE 'fixed seeds' story:
noise is an explicit input, not an RNG-equivalence chase — SURVEY.md §7).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.core import process, sampling, schedules
from dsdiff_tpu.models import UNet
from dsdiff_tpu.parallel import mesh as pmesh
from dsdiff_tpu.train import TrainState, make_optimizer
from dsdiff_tpu.train import schedule_sampler as ss
from dsdiff_tpu.train.step import TaskConfig, make_train_step

TINY = dict(model_channels=8, num_res_blocks=1, attention_resolutions=(),
            channel_mult=(1, 2), num_heads=1)


def _setup(mesh, fsdp_params=False):
    model = UNet(in_channels=2, out_channels=1, **TINY)
    B, H = 8, 16
    x = jnp.zeros((B, H, H, 2))
    params = model.init(jax.random.PRNGKey(0), x[:1], jnp.zeros((1,)))
    sched = schedules.DiffusionSchedule.named("linear", 20)
    task = TaskConfig(parameterization="eps", loss_type="l2",
                      feature_kind=None)
    state = TrainState.create(model.apply, params, make_optimizer(1e-3))
    if fsdp_params:
        # full ZeRO placement: params, EMA AND Adam moments sharded
        state = jax.device_put(
            state,
            pmesh.state_sharding(mesh, state, min_size_to_shard=2**8),
        )
    else:
        state = jax.device_put(state, pmesh.replicated(mesh))
    sampler = jax.device_put(ss.uniform_init(20), pmesh.replicated(mesh))
    rng = jax.random.PRNGKey(7)
    batch_np = {
        "image": np.random.default_rng(0).normal(
            size=(B, H, H, 1)).astype(np.float32),
        "target": np.random.default_rng(1).normal(
            size=(B, H, H, 1)).astype(np.float32),
    }
    batch = {k: jax.device_put(v, pmesh.batch_sharding(mesh))
             for k, v in batch_np.items()}
    step_fn = make_train_step(task, sched, donate=False)
    return state, sampler, batch, rng, step_fn


def test_dp8_matches_single_device():
    mesh8 = pmesh.make_mesh(n_data=8, n_fsdp=1)
    mesh1 = pmesh.make_mesh(n_data=1, n_fsdp=1, devices=jax.devices()[:1])
    outs = {}
    for name, mesh in [("dp8", mesh8), ("dp1", mesh1)]:
        state, sampler, batch, rng, step_fn = _setup(mesh)
        with jax.set_mesh(mesh):
            new_state, _, metrics = step_fn(state, sampler, batch, rng)
        outs[name] = (
            float(jax.device_get(metrics["loss"])),
            np.asarray(jax.device_get(
                jax.tree.leaves(new_state.params)[0])),
        )
    assert outs["dp8"][0] == pytest.approx(outs["dp1"][0], rel=1e-5)
    np.testing.assert_allclose(outs["dp8"][1], outs["dp1"][1],
                               rtol=1e-5, atol=1e-7)


def _count_fsdp(tree):
    n = 0
    for leaf in jax.tree.leaves(tree):
        sh = getattr(leaf, "sharding", None)
        if sh is not None and "fsdp" in str(getattr(sh, "spec", "")):
            n += 1
    return n


def test_fsdp_sharded_params_execute():
    mesh = pmesh.make_mesh(n_data=4, n_fsdp=2)
    state, sampler, batch, rng, step_fn = _setup(mesh, fsdp_params=True)
    # params AND Adam moments actually sharded over fsdp (ZeRO — the
    # moments are 2x the param bytes, VERDICT r3 item 2)
    assert _count_fsdp(state.params) > 0
    assert _count_fsdp(state.opt_state) > 0
    with jax.set_mesh(mesh):
        new_state, _, metrics = step_fn(state, sampler, batch, rng)
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    # shardings survive the optimizer update
    assert _count_fsdp(new_state.params) > 0
    assert _count_fsdp(new_state.opt_state) > 0


def test_fsdp_matches_replicated():
    """ZeRO-sharded step == replicated step numerically."""
    mesh_f = pmesh.make_mesh(n_data=4, n_fsdp=2)
    mesh_r = pmesh.make_mesh(n_data=4, n_fsdp=2)
    outs = {}
    for name, mesh, fsdp in [("zero", mesh_f, True), ("rep", mesh_r, False)]:
        state, sampler, batch, rng, step_fn = _setup(mesh, fsdp_params=fsdp)
        with jax.set_mesh(mesh):
            new_state, _, metrics = step_fn(state, sampler, batch, rng)
        outs[name] = (
            float(jax.device_get(metrics["loss"])),
            np.asarray(jax.device_get(
                jax.tree.leaves(new_state.params)[0])),
            np.asarray(jax.device_get(
                [leaf for leaf in jax.tree.leaves(new_state.opt_state)
                 if getattr(leaf, "ndim", 0) > 0][0])),
        )
    assert outs["zero"][0] == pytest.approx(outs["rep"][0], rel=1e-5)
    np.testing.assert_allclose(outs["zero"][1], outs["rep"][1],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(outs["zero"][2], outs["rep"][2],
                               rtol=1e-5, atol=1e-7)


def test_dp8_sampling_matches_single_device():
    """Batch-parallel DDIM sampling over the data axis == single device
    (the production serving layout: slices sharded over chips)."""
    from dsdiff_tpu.train.step import make_sample_fn

    model = UNet(in_channels=2, out_channels=1, **TINY)
    B, H = 8, 16
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, H, 2)), jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 20)
    rsched = schedules.respace(betas, schedules.space_timesteps(20, "5"))
    task = TaskConfig(parameterization="eps", loss_type="l2")
    sample_fn = make_sample_fn(model.apply, rsched, task, "ddim")
    cond_np = np.random.default_rng(0).normal(size=(B, H, H, 1)).astype(
        np.float32)
    rng = jax.random.PRNGKey(3)

    outs = {}
    for name, mesh in [
        ("dp8", pmesh.make_mesh(n_data=8, n_fsdp=1)),
        ("dp1", pmesh.make_mesh(n_data=1, n_fsdp=1,
                                devices=jax.devices()[:1])),
    ]:
        p = jax.device_put(params, pmesh.replicated(mesh))
        cond = jax.device_put(cond_np, pmesh.batch_sharding(mesh))
        with jax.set_mesh(mesh):
            out = sample_fn(p, cond, rng)
        outs[name] = np.asarray(jax.device_get(out))
    np.testing.assert_allclose(outs["dp8"], outs["dp1"],
                               rtol=1e-5, atol=1e-6)


def test_explicit_noise_bit_determinism():
    """Same explicit noise arrays -> bit-identical losses across runs."""
    model = UNet(in_channels=2, out_channels=1, **TINY)
    x0 = np.random.default_rng(0).normal(size=(2, 16, 16, 1)).astype(
        np.float32)
    noise = np.random.default_rng(1).normal(size=x0.shape).astype(np.float32)
    cond = np.random.default_rng(2).normal(size=x0.shape).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 2)), jnp.zeros((1,)))
    sched = schedules.DiffusionSchedule.named("linear", 20)
    t = jnp.array([3, 15])

    def run():
        def mf(xt, tm):
            return model.apply(
                params, jnp.concatenate([xt, jnp.asarray(cond)], -1), tm)

        terms, _ = process.training_losses(
            sched, mf, jnp.asarray(x0), t, jnp.asarray(noise),
            parameterization="eps", loss_type="l2",
        )
        return np.asarray(terms["loss"])

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_sampler_seed_determinism():
    """Same PRNG key -> identical samples; different key -> different."""
    sched = schedules.DiffusionSchedule.named("linear", 10)

    def fn(x, t):
        return jnp.tanh(x)

    xT = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 1))
    o1 = sampling.p_sample_loop(sched, fn, xT, jax.random.PRNGKey(5))
    o2 = sampling.p_sample_loop(sched, fn, xT, jax.random.PRNGKey(5))
    o3 = sampling.p_sample_loop(sched, fn, xT, jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(jnp.abs(o1 - o3).max()) > 1e-6


@pytest.mark.slow
def test_trainer_mesh_e2e(tmp_path):
    """Multi-chip training through the orchestrator users actually call
    (VERDICT r3 item 3): Trainer on a data=4 x fsdp=2 mesh ZeRO-shards its
    own state, fits, saves/restores sharded arrays through Orbax, predicts
    — and matches the replicated run numerically."""
    from dsdiff_tpu.data import h5store
    from dsdiff_tpu.train import Config, Trainer

    rng = np.random.default_rng(0)
    for c in range(4):
        for i in range(8):
            for split in ("tr", "ts"):
                h5store.write_slice(
                    tmp_path / "data" / f"images_{split}_16"
                    / f"case{c}" / f"layer_{i}.h5",
                    {k: rng.normal(size=(16, 16)).astype(np.float32)
                     for k in ("A", "B")},
                )

    def make_cfg(fsdp_min):
        return Config.wrap(dict(
            net_mode="ddpm", train_keys=["A", "B"],
            h5_2d_img_dir=str(tmp_path / "data"), image_size=16,
            train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
            diffusion_steps=10, learn_sigma=False, parameterization="eps",
            disentangle_distance=None,
            unet_config={"params": {
                "model_channels": 8, "num_res_blocks": 1,
                "channel_mult": [1, 2], "attention_resolutions": [],
                "num_heads": 1}},
            num_epochs=40, lr=1e-3,
            sampler_setting={"sampler": "ddim", "sample_steps": 5},
            seed=3, bf16=False, fsdp_min_size=fsdp_min,
        ))

    mesh = pmesh.make_mesh(n_data=4, n_fsdp=2)
    tr = Trainer(make_cfg(2**8), tmp_path / "run_zero", mesh=mesh)
    # the trainer's own state is ZeRO-placed: params AND Adam moments
    assert _count_fsdp(tr.state.params) > 0
    assert _count_fsdp(tr.state.opt_state) > 0
    step = tr.fit(max_steps=12, log_every=50, val_every_epochs=10**9)
    vm = tr.validate(max_batches=2)
    tr.ckpt.save(step, tr.state, tr.sampler_state,
                 metrics={"val_ssim": vm["ssim"], "val_mae": vm["mae"]})
    tr.ckpt.wait()

    # replicated control on the same data-axis layout (fsdp axis present
    # but min_size_to_shard too large to shard anything)
    tr_rep = Trainer(make_cfg(2**30), tmp_path / "run_rep",
                     mesh=pmesh.make_mesh(n_data=4, n_fsdp=2))
    assert _count_fsdp(tr_rep.state.params) == 0
    tr_rep.fit(max_steps=12, log_every=50, val_every_epochs=10**9)
    vm_rep = tr_rep.validate(max_batches=2)
    assert vm["ssim"] == pytest.approx(vm_rep["ssim"], abs=1e-4)
    assert vm["mae"] == pytest.approx(vm_rep["mae"], abs=1e-4)

    # restore into a fresh sharded trainer: step + shardings survive
    tr2 = Trainer(make_cfg(2**8), tmp_path / "run_zero", mesh=mesh)
    tr2.state, tr2.sampler_state = tr2.ckpt.restore(
        tr2.state, tr2.sampler_state)
    assert int(jax.device_get(tr2.state.step)) == step
    assert _count_fsdp(tr2.state.params) > 0
    assert _count_fsdp(tr2.state.opt_state) > 0
    p_a = np.asarray(jax.device_get(jax.tree.leaves(tr.state.params)[0]))
    p_b = np.asarray(jax.device_get(jax.tree.leaves(tr2.state.params)[0]))
    np.testing.assert_array_equal(p_a, p_b)
    out_dir, _ = tr2.predict()
    assert sorted(out_dir.glob("*_pred.nii.gz"))
    for t in (tr, tr_rep, tr2):
        t.ckpt.close()


@pytest.mark.slow
def test_graft_entry_dryrun():
    """The driver's multichip dry run must pass on the CPU mesh."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)
