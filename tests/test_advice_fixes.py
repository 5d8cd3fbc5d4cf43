"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. OpenAI-math net_modes translate noise_schedule 'linear' to the OpenAI
   get_named_beta_schedule('linear') table (scale*linspace(1e-4, 2e-2)),
   while LDM-math modes keep the LDM sqrt-space 'linear'.
2. BatchLoader partitions the global batch across processes.
3. fit_tensor reproduces make_it_fit's n_used normalization (ddpm.py:250-260).
4. VolumeAssembler center-crops predictions to undo divisible_pad's
   symmetric padding.
5. p_mean_variance supports FIXED_LARGE variance for the OpenAI-parity
   ancestral sampler.
"""
import pytest
import jax.numpy as jnp
import numpy as np

from dsdiff_tpu.core import process, schedules
from dsdiff_tpu.train.config import Config
from dsdiff_tpu.train.surgery import fit_tensor


def _tiny_trainer_cfg(net_mode, T=100):
    return Config.wrap(dict(
        net_mode=net_mode, diffusion_steps=T, image_size=8, init_size=8,
        learn_sigma=False, disentangle_distance="",
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [2]}},
        sampler_setting={"sampler": "ddim", "sample_steps": 2},
        num_epochs=1, bf16=False,
    ))


@pytest.mark.slow
def test_openai_linear_schedule_parity(tmp_path):
    """ADVICE high: flagship 'linear' must equal OpenAI
    get_named_beta_schedule('linear') = (1000/T)*linspace(1e-4, 2e-2, T)."""
    from dsdiff_tpu.train.trainer import Trainer

    T = 100
    tr = Trainer(_tiny_trainer_cfg("ds_diff_gaussian", T), tmp_path / "a")
    scale = 1000.0 / T
    expected = np.linspace(scale * 1e-4, scale * 2e-2, T)
    np.testing.assert_allclose(tr.betas, expected, rtol=1e-12)
    # fixed_large is the OpenAI ancestral default when not learn_sigma
    assert tr.task.variance_type == "fixed_large"


def test_ldm_linear_schedule_kept(tmp_path):
    """LDM-math modes (trainer_ddpm extends ldm DDPM) keep sqrt-space betas
    (ldm/modules/diffusionmodules/util.py:30-33)."""
    from dsdiff_tpu.train.trainer import Trainer

    T = 100
    tr = Trainer(_tiny_trainer_cfg("ddpm", T), tmp_path / "b")
    expected = np.linspace(1e-4**0.5, 2e-2**0.5, T) ** 2
    np.testing.assert_allclose(tr.betas, expected, rtol=1e-12)
    assert tr.task.variance_type == "fixed_small"


def test_batch_loader_process_partition(tmp_path):
    """ADVICE medium: per-process loaders must yield disjoint contiguous
    shards of the same global batch."""
    from dsdiff_tpu.data.h5store import write_slice
    from dsdiff_tpu.data.pipeline import BatchLoader, SliceDataset

    rng = np.random.default_rng(0)
    for c in range(2):
        for i in range(6):
            write_slice(
                tmp_path / "images_tr_16" / f"case{c}" / f"layer_{i}.h5",
                {k: rng.normal(size=(16, 16)).astype(np.float32)
                 for k in ("A", "B")},
            )
    ds = SliceDataset(tmp_path, split="images_tr_16", keys=("A", "B"))
    global_loader = BatchLoader(ds, 4, seed=7, shuffle=True, drop_last=False,
                                process_count=1, process_index=0)
    shard_loaders = [
        BatchLoader(ds, 4, seed=7, shuffle=True, drop_last=False,
                    process_count=2, process_index=p)
        for p in range(2)
    ]
    g_batches = list(global_loader.epoch(0))
    s_batches = [list(sl.epoch(0)) for sl in shard_loaders]
    assert len(g_batches) == len(s_batches[0]) == len(s_batches[1])
    for gb, b0, b1 in zip(g_batches, *s_batches):
        assert b0["image"].shape[0] == b1["image"].shape[0] == 2
        np.testing.assert_array_equal(
            gb["image"], np.concatenate([b0["image"], b1["image"]])
        )
        np.testing.assert_array_equal(
            gb["valid"], np.concatenate([b0["valid"], b1["valid"]])
        )


def test_fit_tensor_n_used_normalization():
    """ADVICE medium: rank>=2 cycling divides by the reference's n_used
    (ddpm.py:250-260, ones-initialized counter)."""
    rng = np.random.default_rng(0)
    old = rng.normal(size=(4, 2, 3, 3)).astype(np.float32)
    new_shape = (4, 5, 3, 3)
    got = fit_tensor(old, new_shape)

    # oracle: the reference loop verbatim
    new = np.zeros(new_shape, np.float64)
    for i in range(new_shape[0]):
        for j in range(new_shape[1]):
            new[i, j] = old[i % old.shape[0], j % old.shape[1]]
    n_used_old = np.ones(old.shape[1])
    for j in range(new_shape[1]):
        n_used_old[j % old.shape[1]] += 1
    n_used_new = np.zeros(new_shape[1])
    for j in range(new_shape[1]):
        n_used_new[j] = n_used_old[j % old.shape[1]]
    new /= n_used_new[None, :, None, None]
    np.testing.assert_allclose(got, new.astype(np.float32), rtol=1e-6)

    # 1-D stays pure cycling (reference :242-244)
    v = np.arange(3, dtype=np.float32)
    np.testing.assert_array_equal(fit_tensor(v, (5,)), [0, 1, 2, 0, 1])


def test_assembler_center_crop(tmp_path):
    """ADVICE medium: assembled volumes must undo divisible_pad's symmetric
    padding (front ph//2), not crop top-left."""
    from dsdiff_tpu.data.nifti import Nifti
    from dsdiff_tpu.data.transforms import divisible_pad
    from dsdiff_tpu.eval.assemble import VolumeAssembler

    h, w, n = 28, 30, 2
    rng = np.random.default_rng(1)
    content = rng.normal(size=(h, w, n)).astype(np.float32)
    template = Nifti(np.zeros((h, w, n), np.float32))
    asm = VolumeAssembler(tmp_path, task_id="t")
    for i in range(n):
        padded = divisible_pad(content[:, :, i], k=32)
        assert padded.shape == (32, 32)
        asm.add("case", i, padded)
    vol = asm.volume("case", template)
    np.testing.assert_allclose(vol.data, content, rtol=1e-6)


def test_fixed_large_variance():
    """ADVICE low: FIXED_LARGE = beta_t with the t=0 entry patched to
    posterior_variance[1] (gaussian_diffusion.py:271-280)."""
    sched = schedules.DiffusionSchedule.named("linear", 10)
    x = jnp.zeros((3, 4, 4, 1))
    out = jnp.zeros((3, 4, 4, 1))
    for t_val, expect in [
        (0, float(sched.posterior_variance[1])),
        (5, float(sched.betas[5])),
    ]:
        t = jnp.full((3,), t_val, jnp.int32)
        pmv = process.p_mean_variance(
            sched, out, x, t, "eps", learn_sigma=False,
            variance_type="fixed_large",
        )
        np.testing.assert_allclose(
            np.asarray(pmv.variance).ravel()[0], expect, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pmv.log_variance).ravel()[0],
            np.log(expect), rtol=1e-5,
        )
    # fixed_small keeps the posterior table
    t = jnp.full((3,), 5, jnp.int32)
    pmv = process.p_mean_variance(
        sched, out, x, t, "eps", learn_sigma=False,
        variance_type="fixed_small",
    )
    np.testing.assert_allclose(
        np.asarray(pmv.variance).ravel()[0],
        float(sched.posterior_variance[5]), rtol=1e-6,
    )
