"""Structured synthetic dataset (data/synthetic.py) + Trainer.set_sampler.

The structured task encodes the DS-Diff causal premise (shared anatomy,
per-contrast nuisance style, independent lesion signal — SURVEY.md §2.1,
UNet_DS_Diff/model.py:654-663 input decomposition), so these tests assert
that causal structure actually holds in the generated arrays — that is what
makes the disentangle A/B in scripts/flagship_quality.py meaningful.
"""
from pathlib import Path

import numpy as np
import pytest

from dsdiff_tpu.data import h5store
from dsdiff_tpu.data.synthetic import (
    make_structured_case, make_structured_dataset,
)


def test_structured_layout_and_range(tmp_path):
    root = make_structured_dataset(tmp_path, n_cases=4, n_slices=2, hw=64,
                                   seed=0, ts_fraction=0.25)
    tr = sorted((root / "images_tr_64").iterdir())
    ts = sorted((root / "images_ts_64").iterdir())
    assert len(tr) == 3 and len(ts) == 1
    arrays = h5store.read_slice(tr[0] / "layer_0.h5", ["A", "B", "C", "GT"])
    for k in ("A", "B", "C", "GT"):
        a = arrays[k]
        assert a.shape == (64, 64) and a.dtype == np.float32
        assert a.min() >= -1.0 and a.max() <= 1.0


def test_structured_causal_structure():
    rng = np.random.default_rng(3)
    slices = make_structured_case(96, rng, n_slices=4)
    for sl in slices:
        A, B, C, GT = (sl[k] for k in ("A", "B", "C", "GT"))
        # lesion lives where B is much brighter than A's anatomy would
        # predict; find it as the strongest positive residual of C
        lesion = C > np.quantile(C, 0.99)
        bg = ~lesion
        # anatomy is shared: A and GT correlate strongly off-lesion
        ga = np.corrcoef(A[bg].ravel(), GT[bg].ravel())[0, 1]
        assert ga > 0.55, ga
        # lesion is visible in B and C but (near-)invisible in A:
        # contrast of the lesion region vs the background, per channel
        def contrast(img):
            return float(img[lesion].mean() - img[bg].mean())

        assert contrast(C) > 0.5
        assert contrast(B) > contrast(A) + 0.1
        # GT ring-enhances: lesion neighbourhood is brighter than GT bg
        assert contrast(GT) > 0.2


def test_structured_val_styles_differ():
    # style is per-case nuisance: the same anatomy-free statistic (median of
    # in-head intensities) should differ across cases far more than across
    # slices within a case
    meds = []
    for seed in range(4):
        rng = np.random.default_rng(seed)
        slices = make_structured_case(64, rng, n_slices=3)
        meds.append([float(np.median(s["A"][s["A"] > -0.9]))
                     for s in slices])
    meds = np.array(meds)
    within = np.mean(np.std(meds, axis=1))
    across = np.std(np.mean(meds, axis=1))
    assert across > 2 * within


def test_style_profiles():
    """'hard' adds a spatial bias field; 'hard_ood' draws from disjoint
    gamma / field-amplitude ranges; 'mild' is byte-stable (regenerating a
    mild dataset must reproduce previously recorded runs exactly)."""
    mild = make_structured_case(64, np.random.default_rng(5), n_slices=2)
    mild2 = make_structured_case(64, np.random.default_rng(5), n_slices=2,
                                 style_profile="mild")
    assert all(np.array_equal(mild[i][k], mild2[i][k])
               for i in range(2) for k in ("A", "B", "C", "GT"))
    hard = make_structured_case(64, np.random.default_rng(5), n_slices=2,
                                style_profile="hard")
    # same seed, same anatomy geometry — but the styled channels differ
    assert not np.allclose(mild[0]["A"], hard[0]["A"])
    # GT is style-free (fixed global mapping): only the lesion rendering
    # chain may shift it, so GT stays highly correlated across profiles
    g = np.corrcoef(mild[0]["GT"].ravel(), hard[0]["GT"].ravel())[0, 1]
    assert g > 0.9, g
    # the bias field is spatially smooth and multiplicative: the ratio
    # hard/mild on in-head pixels varies across space (a scalar remap
    # cannot explain it) — use A, which carries no lesion signal
    ood = make_structured_case(64, np.random.default_rng(5), n_slices=2,
                               style_profile="hard_ood")
    assert not np.allclose(hard[0]["A"], ood[0]["A"])


def test_ood_val_split(tmp_path):
    root = make_structured_dataset(
        tmp_path, n_cases=4, n_slices=2, hw=32, seed=0, ts_fraction=0.25,
        style_profile="hard", ts_style_profile="hard_ood")
    assert (root / "images_tr_32").exists()
    assert (root / "images_ts_32").exists()
    a = h5store.read_slice(
        sorted((root / "images_ts_32").iterdir())[0] / "layer_0.h5",
        ["A", "B", "C", "GT"])
    for k, v in a.items():
        assert np.isfinite(v).all() and v.min() >= -1.0 and v.max() <= 1.0


def test_set_sampler_switches_path(tmp_path):
    """One trained checkpoint, three sampler settings — the predict-time
    sampler rebuild (trainer_use_gaussian_diff.py:586-600)."""
    import jax

    from dsdiff_tpu.train import Config, Trainer

    make_structured_dataset(tmp_path / "d", n_cases=4, n_slices=2, hw=16,
                            seed=0)
    cfg = Config.wrap(dict(
        net_mode="ds_diff_gaussian",
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(tmp_path / "d"), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=4, fold_idx=0,
        diffusion_steps=100,
        parameterization="eps", loss_type="l2",
        disentangle_distance="eu", contrast_lambda=0.1,
        unet_config={"params": {
            "model_channels": 16, "num_res_blocks": 1,
            "channel_mult": [1, 2], "attention_resolutions": [2],
            "num_heads": 2}},
        num_epochs=1, lr=1e-4,
        sampler_setting={"sampler": "ddim", "sample_steps": 4},
        seed=0, bf16=False, log_images=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    batch = next(iter(tr.val_loader.epoch(0)))
    import jax.numpy as jnp

    cond = jnp.asarray(batch["image"])
    rng = jax.random.PRNGKey(0)
    outs = {}
    outs["ddim4"] = tr.sample_fn(tr.state.ema_params, cond, rng)
    tr.set_sampler(sampler="dpm", sample_steps=5, order=2,
                   method="multistep")
    assert tr.sample_steps == 5
    outs["dpm5"] = tr.sample_fn(tr.state.ema_params, cond, rng)
    tr.set_sampler(sampler="ddim", sample_steps=6, ddim_eta=0.5)
    outs["ddim6"] = tr.sample_fn(tr.state.ema_params, cond, rng)
    for k, v in outs.items():
        # data plane pads to /32 (MONAI divisible-pad parity)
        assert v.shape == cond.shape[:3] + (1,), k
        assert bool(np.isfinite(np.asarray(v)).all()), k
    # different samplers genuinely produce different chains
    assert not np.allclose(np.asarray(outs["ddim4"]),
                           np.asarray(outs["dpm5"]))
    tr.ckpt.close()
