"""KV logger, journal, and checkpoint retention behavior."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from dsdiff_tpu.train.checkpoints import CheckpointManager
from dsdiff_tpu.train.state import TrainState, make_optimizer
from dsdiff_tpu.utils.logging import KVLogger, journal


def test_kvlogger_outputs(tmp_path):
    log = KVLogger(tmp_path, stream=open(tmp_path / "out.txt", "w"))
    log.logkv("loss", 1.0)
    log.logkv_mean("acc", 0.0)
    log.logkv_mean("acc", 1.0)
    row = log.dumpkvs()
    assert row["loss"] == 1.0 and row["acc"] == 0.5
    log.logkv("loss", 2.0)
    log.logkv("new_key", 7.0)
    log.dumpkvs()
    lines = (tmp_path / "progress.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["acc"] == 0.5
    csv_text = (tmp_path / "progress.csv").read_text()
    assert "new_key" in csv_text and "acc" in csv_text


def test_journal(tmp_path):
    line = journal(tmp_path, "hello", 42)
    assert "hello 42" in line
    assert "hello 42" in (tmp_path / "log_txt.txt").read_text()


def test_checkpoint_retention_best(tmp_path):
    params = {"w": jnp.arange(4.0)}
    st = TrainState.create(lambda p, x: x, params, make_optimizer(1e-2))
    mgr = CheckpointManager(tmp_path, max_to_keep=2, best_metric="val_ssim")
    for step, ssim in [(1, 0.5), (2, 0.9), (3, 0.4), (4, 0.3)]:
        st = st.replace(step=jnp.asarray(step))
        mgr.save(step, st, metrics={"val_ssim": ssim})
    mgr.wait()
    assert mgr.best_step() == 2  # highest val_ssim retained
    st2, _ = mgr.restore(st, step=mgr.best_step())
    assert int(st2.step) == 2
    best_params = mgr.restore_params({"w": jnp.zeros(4)}, ema=True)
    np.testing.assert_allclose(np.asarray(best_params["w"]),
                               np.arange(4.0), rtol=1e-6)
    mgr.close()


def test_checkpoint_latest_survives_best_retention(tmp_path):
    """The latest checkpoint must NEVER be garbage-collected by best-N
    retention: it is the resume anchor. Regression for the round-3
    flagship-quality stall — checkpoints saved before the SSIM fp32 fix
    carried impossible val_ssim>1 metrics, every honest new save ranked
    below them, orbax deleted each new step immediately, and chunked
    resume replayed steps 3000-6000 forever."""
    params = {"w": jnp.arange(4.0)}
    st = TrainState.create(lambda p, x: x, params, make_optimizer(1e-2))
    mgr = CheckpointManager(tmp_path, max_to_keep=2, best_metric="val_ssim")
    # two poisoned early steps with bogus >1 metrics, then honest saves
    for step, ssim in [(1, 1.14), (2, 1.13), (3, 0.95), (4, 0.99)]:
        st = st.replace(step=jnp.asarray(step))
        mgr.save(step, st, metrics={"val_ssim": ssim})
        mgr.wait()
        assert mgr.latest_step() == step  # latest is always restorable
    st2, _ = mgr.restore(st)
    assert int(st2.step) == 4
    # a fresh manager on the same dir (chunked-subprocess resume) agrees
    mgr.close()
    mgr2 = CheckpointManager(tmp_path, max_to_keep=2,
                             best_metric="val_ssim")
    assert mgr2.latest_step() == 4
    mgr2.close()


def test_checkpoint_manager_keep_best_off(tmp_path):
    """keep_best=False (the frozen-VAE read-only manager path,
    trainer.py vae_checkpoint) must construct and round-trip — this
    orbax's CheckpointManagerOptions validator rejects best_mode=None,
    which crashed the latent two-stage pipeline on first hardware run."""
    params = {"w": jnp.arange(3.0)}
    st = TrainState.create(lambda p, x: x, params, make_optimizer(1e-2))
    mgr = CheckpointManager(tmp_path, keep_best=False)
    mgr.save(5, st)
    mgr.wait()
    assert mgr.latest_step() == 5
    got = mgr.restore_params({"w": jnp.zeros(3)}, ema=False)
    np.testing.assert_allclose(np.asarray(got["w"]), np.arange(3.0))
    mgr.close()


def test_evaluate_volume_small():
    from dsdiff_tpu.eval.metrics import evaluate_volume

    rng = np.random.default_rng(0)
    vol = rng.uniform(-1, 1, (48, 48, 4)).astype(np.float32)
    row = evaluate_volume(vol, vol * 0.95 + 0.01)
    assert all(np.isfinite(v) for v in row.values())
    assert row["ms_ssim"] > 0.5
