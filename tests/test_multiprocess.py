"""Real multi-process distributed test: two OS processes rendezvous through
``parallel.dist.initialize`` (the reference's MPI+DDP capability,
Disc_diff/guided_diffusion/dist_util.py:21-93 + train_util.py:328), run one
GSPMD-sharded train step on a mesh spanning both processes, and the loss
must equal the single-process run on the identical global batch.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["DSDIFF_REPO"])
    import numpy as np
    import jax.numpy as jnp

    from dsdiff_tpu.parallel import dist, mesh as pmesh
    from dsdiff_tpu.data.pipeline import BatchLoader, SliceDataset
    from dsdiff_tpu.core import schedules
    from dsdiff_tpu.train import TrainState, make_optimizer
    from dsdiff_tpu.train import schedule_sampler as ss
    from dsdiff_tpu.train.step import TaskConfig, make_train_step
    from dsdiff_tpu.models import build_model

    pid = int(os.environ["DSDIFF_PID"])
    nproc = int(os.environ["DSDIFF_NPROC"])
    dist.initialize(
        coordinator_address=os.environ["DSDIFF_COORD"],
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = len(jax.devices())

    mesh = pmesh.make_mesh(n_data=n_dev, n_fsdp=1)
    ds = SliceDataset(os.environ["DSDIFF_DATA"], split="images_tr_16",
                      keys=("A", "B"))
    loader = BatchLoader(ds, batch_size=8, seed=5, shuffle=True,
                         drop_last=True)
    assert loader.local_batch_size == 8 // nproc or nproc == 1

    model = build_model("unet", in_channels=2, out_channels=1,
                        model_channels=8, num_res_blocks=1,
                        channel_mult=(1, 2), attention_resolutions=(),
                        num_heads=1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 2)), jnp.zeros((1,)))
    sched = schedules.DiffusionSchedule.named("linear", 10)
    task = TaskConfig(parameterization="eps", loss_type="l2",
                      learn_sigma=False, feature_kind=None)
    state = TrainState.create(model.apply, params, make_optimizer(1e-3))
    sampler_state = ss.uniform_init(10)
    rep = pmesh.replicated(mesh)
    state = jax.device_put(state, rep)
    sampler_state = jax.device_put(sampler_state, rep)

    step_fn = make_train_step(task, sched, donate=False)
    batch = next(iter(loader.epoch(0)))
    dev_batch = pmesh.shard_batch(mesh, {
        "image": batch["image"], "target": batch["target"]})
    # every process must see the full GLOBAL batch through the sharded array
    assert dev_batch["image"].shape[0] == 8, dev_batch["image"].shape
    with jax.set_mesh(mesh):
        state2, _, metrics = step_fn(state, sampler_state, dev_batch,
                                     jax.random.PRNGKey(7))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    dist.sync_hosts("done")
    gathered = dist.all_gather_host(np.asarray([loss], np.float32))
    assert gathered.shape[0] == nproc
    # identical loss on every process (same global batch, same seed)
    assert np.allclose(gathered, gathered[0], rtol=1e-6), gathered
    print(json.dumps({"pid": pid, "loss": loss,
                      "n_dev": n_dev,
                      "gathered": gathered.ravel().tolist()}))
""")


def _write_dataset(root: Path):
    import h5py  # noqa: F401  (ensures module available in workers too)

    from dsdiff_tpu.data import h5store

    rng = np.random.default_rng(0)
    for c in range(2):
        for i in range(8):
            h5store.write_slice(
                root / "images_tr_16" / f"case{c}" / f"layer_{i}.h5",
                {k: rng.normal(size=(16, 16)).astype(np.float32)
                 for k in ("A", "B")},
            )


def _run_workers(tmp_path, nproc: int, devices_per_proc: int):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={devices_per_proc}"
        )
        env["XLA_FLAGS"] = " ".join(flags)
        env["DSDIFF_REPO"] = str(REPO)
        env["DSDIFF_DATA"] = str(tmp_path / "data")
        env["DSDIFF_COORD"] = f"localhost:{port}"
        env["DSDIFF_PID"] = str(pid)
        env["DSDIFF_NPROC"] = str(nproc)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


@pytest.mark.slow
@pytest.mark.slow
def test_two_process_step_matches_single(tmp_path):
    _write_dataset(tmp_path / "data")
    two = _run_workers(tmp_path, nproc=2, devices_per_proc=2)
    assert all(o["n_dev"] == 4 for o in two)
    assert two[0]["gathered"] == two[1]["gathered"]
    # single process, same 4-device mesh, same data/seeds
    one = _run_workers(tmp_path, nproc=1, devices_per_proc=4)
    np.testing.assert_allclose(one[0]["loss"], two[0]["loss"], rtol=1e-5)
