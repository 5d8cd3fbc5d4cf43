"""Two-stage latent pipeline on hardware: train the KL-VAE, then train
latent diffusion against the frozen trained first stage.

Completes the backbone-sweep story: the latent leg with a random first
stage only proves machinery; this run produces an actual latent-space
result the way the reference pipeline does (finetune_autoencoder ->
trainer_latent_diffusion).

Usage: python scripts/latent_two_stage.py [vae_steps] [ldm_steps]
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
from dsdiff_tpu.train.vae_loop import VaeTrainer  # noqa: E402
from train_smoke_tpu import make_synthetic  # noqa: E402

HW = 64
FIRST_STAGE = {"params": {"ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                          "z_channels": 3, "embed_dim": 3}}


def main():
    vae_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    ldm_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    tmp = Path(tempfile.mkdtemp(prefix="dsdiff_latent2_"))
    make_synthetic(tmp, hw=HW)

    vae_cfg = Config.wrap(dict(
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(tmp), image_size=HW,
        train_batch_size=16, num_epochs=10 ** 6, lr=1e-4,
        seed=0, bf16=True,
        kl_weight=1e-6, perceptual_weight=0.1,
        disc_start=10 ** 9,  # pure AE phase for this budget
        checkpoint_epoch=100,
        first_stage=FIRST_STAGE,
    ))
    t0 = time.time()
    vt = VaeTrainer(vae_cfg, tmp / "vae")
    vt.fit(max_steps=vae_steps)
    rec = vt.reconstruction_metrics()
    print(json.dumps({"stage": "vae", "steps": vae_steps,
                      "wall_s": round(time.time() - t0, 1), **rec}),
          flush=True)
    vt.ckpt.wait()

    ldm_cfg = Config.wrap(dict(
        net_mode="latent", train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(tmp), image_size=HW,
        train_batch_size=16, val_batch_size=16, fold_K=4, fold_idx=0,
        diffusion_steps=1000, parameterization="eps", loss_type="l2",
        disentangle_distance=None, scale_by_std=True,
        vae_checkpoint=str(tmp / "vae" / "checkpoint"),
        first_stage=FIRST_STAGE,
        unet_config={"params": {"model_channels": 48, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [2],
                                "num_heads": 4,
                                "use_scale_shift_norm": True}},
        num_epochs=10 ** 6, lr=2e-4,
        sampler_setting={"sampler": "ddim", "sample_steps": 20},
        seed=0, bf16=True, ema_rate=0.999, log_images=False,
    ))
    t0 = time.time()
    tr = Trainer(ldm_cfg, tmp / "ldm")
    tr.fit(max_steps=ldm_steps, log_every=max(ldm_steps // 4, 1),
           val_every_epochs=10 ** 9)
    m = tr.validate(max_batches=2)
    print(json.dumps({
        "stage": "latent_diffusion", "steps": ldm_steps,
        "ssim": round(m["ssim"], 4), "psnr": round(m["psnr"], 2),
        "mae": round(m["mae"], 4),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)
    tr.ckpt.close()


if __name__ == "__main__":
    main()
