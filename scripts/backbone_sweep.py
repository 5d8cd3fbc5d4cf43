"""Pipeline/backbone sweep on the synthetic task (reference parity:
backbon_explanation.md:108-115 compares UNet/ViT/DiT/Transformer PSNR).

Trains each pipeline for the same step budget at 64^2 on the live chip and
reports final SSIM / PSNR:
  ddpm        — plain conditional U-Net baseline
  ds_diff     — flagship 4-stream disentangled (LDM math)
  disc_diff   — DisC com/dist 4-stream
  dit         — DiT backbone (adaLN-Zero, cond concat)

Usage: python scripts/backbone_sweep.py [steps]
"""
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsdiff_tpu.train import Config, Trainer  # noqa: E402
from train_smoke_tpu import make_synthetic  # noqa: E402

HW = 64

COMMON = dict(
    train_keys=["A", "B", "C", "GT"],
    image_size=HW,
    train_batch_size=16, val_batch_size=16,
    fold_K=4, fold_idx=0,
    diffusion_steps=1000,
    parameterization="eps", loss_type="l2",
    num_epochs=10 ** 9, lr=2e-4,
    sampler_setting={"sampler": "ddim", "sample_steps": 20},
    seed=0, bf16=True, ema_rate=0.999, log_images=False,
)

UNET = {"params": {"model_channels": 48, "num_res_blocks": 1,
                   "channel_mult": [1, 2, 4], "attention_resolutions": [4],
                   "num_heads": 4, "use_scale_shift_norm": True}}

MODES = {
    "ddpm": dict(net_mode="ddpm", unet_config=UNET,
                 disentangle_distance=None),
    "ds_diff_gaussian": dict(net_mode="ds_diff_gaussian", unet_config=UNET,
                             disentangle_distance="eu", contrast_lambda=0.1),
    "disc_diff": dict(net_mode="disc_diff", unet_config=UNET,
                      disen_lambda=0.1),
    "dit": dict(net_mode="dit", unet_config=UNET,
                disentangle_distance=None,
                ViT_config={"params": {"input_size": HW, "patch_size": 4,
                                       "hidden_size": 256, "depth": 6,
                                       "num_heads": 8}}),
    "palette": dict(net_mode="palette", unet_config=UNET,
                    disentangle_distance=None),
    # latent: f4 VAE (random-init, trained jointly frozen? no — frozen
    # random first stage is useless for quality; this leg demonstrates the
    # full latent machinery on hardware, quality tracks the VAE)
    "latent": dict(
        net_mode="latent", disentangle_distance=None, scale_by_std=True,
        first_stage={"params": {"ch": 32, "ch_mult": [1, 2],
                                "num_res_blocks": 1, "z_channels": 3,
                                "embed_dim": 3}},
        unet_config={"params": {"model_channels": 48, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [2],
                                "num_heads": 4,
                                "use_scale_shift_norm": True}},
    ),
}


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else list(MODES)
    tmp = Path(tempfile.mkdtemp(prefix="dsdiff_sweep_"))
    make_synthetic(tmp, hw=HW)
    for name in only:
        extra = MODES[name]
        cfg = Config.wrap({**COMMON, **extra, "h5_2d_img_dir": str(tmp)})
        tr = Trainer(cfg, tmp / f"run_{name}")
        t0 = time.time()
        tr.fit(max_steps=steps, log_every=max(steps // 4, 1),
               val_every_epochs=10 ** 9)
        m = tr.validate(max_batches=2)
        print(json.dumps({
            "backbone": name, "steps": steps,
            "ssim": round(m["ssim"], 4), "psnr": round(m["psnr"], 2),
            "mae": round(m["mae"], 4),
            "wall_s": round(time.time() - t0, 1),
        }), flush=True)
        tr.ckpt.close()


if __name__ == "__main__":
    main()
