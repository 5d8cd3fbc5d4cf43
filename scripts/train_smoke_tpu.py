"""Convergence smoke on real hardware: learnable synthetic task.

The reference validates scientifically (seeded runs + val SSIM,
SURVEY.md §4); this script is that check in miniature: a synthetic
cond->target mapping (target = smoothed negation of the conditions) that a
conditional diffusion model must learn, trained for a few hundred steps at
64^2, reporting val SSIM before/after. Run on TPU:

    python scripts/train_smoke_tpu.py [steps]
"""
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsdiff_tpu.data import h5store  # noqa: E402
from dsdiff_tpu.train import Config, Trainer  # noqa: E402


def make_synthetic(root: Path, n_cases=8, n_slices=8, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    import scipy.ndimage as ndi

    for c in range(n_cases):
        for i in range(n_slices):
            base = ndi.gaussian_filter(
                rng.normal(size=(hw, hw)), sigma=4
            ).astype(np.float32)
            base = base / (np.abs(base).max() + 1e-6)
            cond1 = base
            cond2 = ndi.gaussian_filter(base, 2).astype(np.float32)
            cond3 = np.abs(base).astype(np.float32)
            target = np.clip(-base * 0.8, -1, 1).astype(np.float32)
            for split in ("tr", "ts"):
                h5store.write_slice(
                    root / f"images_{split}_{hw}" / f"case{c}"
                    / f"layer_{i}.h5",
                    {"A": cond1, "B": cond2, "C": cond3, "GT": target},
                )


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    net_mode = sys.argv[2] if len(sys.argv) > 2 else "ddpm"
    tmp = Path(tempfile.mkdtemp(prefix="dsdiff_smoke_"))
    make_synthetic(tmp)
    cfg = Config.wrap(dict(
        net_mode=net_mode,
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(tmp),
        image_size=64,
        train_batch_size=16,
        val_batch_size=16,
        fold_K=4, fold_idx=0,
        diffusion_steps=1000,
        parameterization="eps", loss_type="l2",
        disentangle_distance="eu" if net_mode == "ds_diff_gaussian" else None,
        contrast_lambda=0.1,
        unet_config={"params": {
            "model_channels": 64 if net_mode == "ddpm" else 48,
            "num_res_blocks": 2 if net_mode == "ddpm" else 1,
            "channel_mult": [1, 2, 4], "attention_resolutions": [4],
            "num_heads": 4, "use_scale_shift_norm": True}},
        num_epochs=10000, lr=2e-4,
        sampler_setting={"sampler": "ddim", "sample_steps": 20},
        seed=0, bf16=True, ema_rate=0.999,
    ))
    tr = Trainer(cfg, tmp / "run")
    t0 = time.time()
    before = tr.validate(max_batches=2)
    tr.fit(max_steps=steps, log_every=max(steps // 10, 1),
           val_every_epochs=10**9)
    after = tr.validate(max_batches=2)
    dt = time.time() - t0
    print(
        f"SMOKE: ssim {before['ssim']:.4f} -> {after['ssim']:.4f}, "
        f"mae {before['mae']:.4f} -> {after['mae']:.4f} "
        f"({steps} steps in {dt:.0f}s)"
    )
    assert after["ssim"] > before["ssim"] + 0.05, "no learning signal!"
    tr.ckpt.close()


if __name__ == "__main__":
    main()
