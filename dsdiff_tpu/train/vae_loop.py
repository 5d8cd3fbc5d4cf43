"""VAE GAN training orchestrator (finetune_autoencoder parity).

Re-design of ldm/models/finetune_autoencoder.py:33-120 +
AutoencoderKL's Lightning plumbing (ldm/models/autoencoder.py:189-499):
slice loader over the gt key only, alternating AE/discriminator jitted
steps, per-step cosine LR (autoencoder.py:300-319), validation
reconstruction loss with best-rec checkpoint retention (:289-298), optional
decoder-only finetune and SD-checkpoint weight surgery on entry
(:111-120 via train.surgery).
"""
from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import BatchLoader, SliceDataset
from ..models import AutoencoderKL, PatchDiscriminator
from ..parallel import mesh as pmesh
from ..utils.logging import KVLogger, journal
from .checkpoints import CheckpointManager
from .config import Config
from .state import TrainState, cosine_lr, make_optimizer
from .vae_trainer import VaeGanConfig, make_vae_steps

__all__ = ["VaeTrainer"]


class VaeTrainer:
    def __init__(self, cfg: Config, workdir, mesh=None):
        self.cfg = cfg
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.logger = KVLogger(self.workdir / "logs")

        fs = dict(cfg.get_path("first_stage.params", {}) or {})
        dtype = jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32
        self.vae = AutoencoderKL(
            ch=int(fs.get("ch", 128)),
            ch_mult=tuple(fs.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=int(fs.get("num_res_blocks", 2)),
            z_channels=int(fs.get("z_channels", 4)),
            embed_dim=int(fs.get("embed_dim", 4)),
            dtype=dtype,
        )
        self.disc = PatchDiscriminator(
            base_channels=int(cfg.get("disc_channels", 64)),
            n_layers=int(cfg.get("disc_num_layers", 3)),
            dtype=dtype,
        )

        # data: reconstruct the gt sequence only (keys[-1]; the loader's
        # target channel)
        keys = list(cfg.get("train_keys",
                            ["F_Data1", "F_Data2", "S_Data1", "S_Data2"]))
        root = Path(cfg.get("h5_2d_img_dir"))
        size = int(cfg.get("image_size", 256))
        self.train_ds = SliceDataset(
            root, split=f"images_tr_{size}", keys=keys, augment=True,
            aug_prob=float(cfg.get("augmentation_prob", 0.4)),
        )
        bs = int(cfg.get("train_batch_size", 8))
        self.loader = BatchLoader(self.train_ds, bs,
                                  seed=int(cfg.get("seed", 2024)))

        seed = int(cfg.get("seed", 2024))
        self.rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, size, size, 1))
        k1, k2, self.rng = jax.random.split(self.rng, 3)
        vparams = self.vae.init(k1, dummy, k1)
        dparams = self.disc.init(k2, dummy)

        steps_per_epoch = max(len(self.loader), 1)
        total = int(cfg.get("num_epochs", 100)) * steps_per_epoch
        lr = cosine_lr(float(cfg.get("lr", 4.5e-6)), total)
        self.vae_state = TrainState.create(
            self.vae.apply, vparams, make_optimizer(lr, betas=(0.5, 0.9))
        )
        self.disc_state = TrainState.create(
            self.disc.apply, dparams, make_optimizer(lr, betas=(0.5, 0.9))
        )
        self.logvar = jnp.zeros(())

        gan_cfg = VaeGanConfig(
            kl_weight=float(cfg.get("kl_weight", 1e-6)),
            perceptual_weight=float(cfg.get("perceptual_weight", 1.0)),
            disc_start=int(cfg.get("disc_start", 50001)),
            disc_weight=float(cfg.get("disc_weight", 0.5)),
            disc_loss=cfg.get("disc_loss", "hinge"),
            decoder_only=bool(cfg.get("decoder_only", False)),
        )
        perceptual_fn = None
        if gan_cfg.perceptual_weight > 0:
            from ..eval.perceptual import PerceptualLoss

            perceptual_fn = PerceptualLoss(
                seed=seed, weights_path=cfg.get("perceptual_weights"),
            ).distance_fn()
        self.ae_step, self.d_step = make_vae_steps(
            self.vae.apply, self.disc.apply, gan_cfg, perceptual_fn
        )
        self.ckpt = CheckpointManager(
            self.workdir / "checkpoint", best_metric="neg_rec_loss"
        )
        n = sum(p.size for p in jax.tree.leaves(vparams))
        journal(self.workdir, f"VAE {n/1e6:.2f}M params, "
                              f"{len(self.train_ds)} slices")

    def reconstruction_metrics(self, max_batches: int = 4):
        """Deterministic reconstruction quality of the current weights.

        Mirrors the val/rec_loss the reference's AutoencoderKL logs for
        best-checkpoint retention (ldm/models/autoencoder.py:289-298), with
        image metrics added: posterior mode (no sampling) -> decode ->
        SSIM / PSNR / MAE over ``max_batches`` unaugmented batches.
        """
        from ..eval import metrics as M

        @jax.jit
        def recon(params, x):
            moments = self.vae.apply(params, x, method="encode")
            return self.vae.apply(params, moments.mode(), method="decode")

        eval_ds = SliceDataset(
            Path(self.cfg.get("h5_2d_img_dir")),
            split=f"images_tr_{int(self.cfg.get('image_size', 256))}",
            keys=list(self.cfg.get(
                "train_keys", ["F_Data1", "F_Data2", "S_Data1", "S_Data2"])),
            augment=False,
        )
        loader = BatchLoader(eval_ds, int(self.cfg.get("train_batch_size", 8)),
                             seed=0, shuffle=False)
        rows = []
        for i, batch in enumerate(loader.epoch(0)):
            if i >= max_batches:
                break
            gt = jnp.asarray(batch["target"])
            pred = recon(self.vae_state.params, gt)
            g1, p1 = gt[..., 0], pred[..., 0]
            mse = float(jnp.mean((gt - pred) ** 2))
            rows.append({
                "rec_ssim": float(jnp.mean(M.ssim(g1, p1, data_range=2.0))),
                "rec_psnr": 10.0 * float(np.log10(4.0 / max(mse, 1e-12))),
                "rec_mae": float(jnp.mean(jnp.abs(gt - pred))),
            })
        return {k: round(float(np.mean([r[k] for r in rows])), 4)
                for k in rows[0]}

    def fit(self, num_epochs: int | None = None, max_steps: int | None = None,
            log_every: int = 50):
        cfg = self.cfg
        num_epochs = num_epochs or int(cfg.get("num_epochs", 100))
        # reference ModelCheckpoint 'checkpoint_epoch' cadence; saving every
        # epoch floods the async Orbax queue when epochs are a few steps
        ckpt_every = max(int(cfg.get("checkpoint_epoch", 1)), 1)
        step = int(jax.device_get(self.vae_state.step))
        for epoch in range(num_epochs):
            t0 = time.time()
            for batch in self.loader.epoch(epoch):
                x = pmesh.shard_batch(self.mesh,
                                      {"image": batch["target"]})
                self.rng, r1, r2 = jax.random.split(self.rng, 3)
                self.vae_state, self.logvar, m = self.ae_step(
                    self.vae_state, self.logvar, self.disc_state.params,
                    x, r1,
                )
                self.disc_state, dm = self.d_step(
                    self.disc_state, self.vae_state.params, x, r2
                )
                step += 1
                if step % log_every == 0:
                    for k, v in {**m, **dm}.items():
                        self.logger.logkv(k, float(jax.device_get(v)))
                    self.logger.logkv("step", step)
                    self.logger.dumpkvs()
                if max_steps and step >= max_steps:
                    break
            rec = float(jax.device_get(m["rec_loss"]))
            done = bool(max_steps and step >= max_steps)
            last = epoch == num_epochs - 1
            if (epoch + 1) % ckpt_every == 0 or done or last:
                self.ckpt.save(step, self.vae_state,
                               metrics={"neg_rec_loss": -rec})
                journal(self.workdir,
                        f"vae epoch {epoch} rec_loss {rec:.4f} "
                        f"({time.time()-t0:.1f}s)")
            if done:
                break
        self.ckpt.wait()
        return step
