"""Flagship-scale quality evidence at 256² (VERDICT r2 item 1).

Trains the bench-headline flagship configuration (DSUnet, model_channels 96,
channel_mult 1-1-2-2-3-3, 256², v-param + charbonnier + learned-sigma +
C-S/S-A-L disentangle — the TryTrainerDiffusion math,
trainer_use_gaussian_diff.py) on the STRUCTURED synthetic multi-contrast
task (data/synthetic.py — shared anatomy, nuisance per-case styles,
independent lesion signal: the DS-Diff causal premise), then evaluates ONE
checkpoint under the three headline sampling paths:

  * DDIM-50  (faithful)
  * DPM-Solver++ 2M, 20 steps
  * cached-cond (ds_diff_split leg only — condition features frozen)

reporting SSIM / PSNR / MS-SSIM / MAE over the full val fold, plus the
A/B the reference's thesis claims (+0.56 dB from disentanglement,
DOCUMENTATION_UPDATE_SUMMARY.md:181): contrast_lambda>0 vs =0 on the same
data/seed/budget.

Legs (each ~10k steps at b=8 ≈ 35 min on one v5e chip):
  1. disen_on   : ds_diff_gaussian, contrast_lambda=0.5
  2. disen_off  : ds_diff_gaussian, contrast_lambda=0.0
  3. split      : ds_diff_split (cached-cond architecture), shorter budget,
                  cached vs faithful delta at 256²

Usage: python scripts/flagship_quality.py [steps] [steps_split] [outdir]
Emits JSON lines; transcribe into PARITY.md.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from dsdiff_tpu.data.synthetic import make_structured_dataset  # noqa: E402
from dsdiff_tpu.eval import metrics as M  # noqa: E402
from dsdiff_tpu.train import Config, Trainer  # noqa: E402

HW = 256
BATCH = 8


def build_cfg(net_mode, data_dir, lam):
    return Config.wrap(dict(
        net_mode=net_mode,
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(data_dir),
        image_size=HW,
        train_batch_size=BATCH, val_batch_size=BATCH,
        fold_K=4, fold_idx=0,
        diffusion_steps=1000,
        parameterization="v", loss_type="charbonnier",
        learn_sigma=True,
        disentangle_distance="eu",
        contrast_lambda=lam,
        unet_config={"params": {
            "model_channels": 96,
            "num_res_blocks": 2,
            "channel_mult": [1, 1, 2, 2, 3, 3],
            "attention_resolutions": [8, 16, 32],
            "num_head_channels": 48,
            "use_scale_shift_norm": True}},
        num_epochs=10 ** 9, lr=1e-4, lr_warm_epoch=0,
        sampler_setting={"sampler": "ddim", "sample_steps": 50},
        seed=0, bf16=True, ema_rate=0.999,
        log_images=False,
        keep_checkpoints=2,
    ))


def eval_full_val(tr, tag, max_batches=None):
    """Full-val-fold metrics under the CURRENT tr.sample_fn."""
    if max_batches is None:
        max_batches = int(os.environ.get("DSDIFF_FQ_EVAL_BATCHES", "14"))
    rng = jax.random.PRNGKey(7)
    rows = []
    t0 = time.time()
    for i, batch in enumerate(tr.val_loader.epoch(0)):
        if i >= max_batches:
            break
        cond = jnp.asarray(batch["image"])
        rng, srng = jax.random.split(rng)
        pred = np.asarray(jax.device_get(
            tr.sample_fn(tr.state.ema_params, cond, srng)))
        gt = np.asarray(batch["target"])
        for b in range(pred.shape[0]):
            if not bool(np.asarray(batch["valid"][b]).any()):
                continue
            t1 = jnp.asarray(gt[b, None, ..., 0])
            p1 = jnp.asarray(pred[b, None, ..., 0])
            # data_range=2.0: images live in [-1,1] (same convention as
            # Trainer.validate / make_val_metrics)
            mse = float(np.mean((gt[b, ..., 0] - pred[b, ..., 0]) ** 2))
            rows.append({
                "ssim": float(M.ssim(t1, p1, data_range=2.0)[0]),
                "ms_ssim": float(M.ms_ssim(t1, p1, data_range=2.0)[0]),
                "psnr": 10.0 * np.log10(4.0 / max(mse, 1e-12)),
                "mae": M.mae(gt[b, ..., 0], pred[b, ..., 0]),
            })
    out = {k: round(float(np.mean([r[k] for r in rows])), 4)
           for k in rows[0]}
    out.update(n_slices=len(rows), eval_s=round(time.time() - t0, 1))
    print(json.dumps({"eval": tag, **out}), flush=True)
    return out


def train_leg(name, net_mode, lam, steps, data_dir, outdir, chunk=1000):
    chunk = max(min(chunk, steps // 2), 1)
    cfg = build_cfg(net_mode, data_dir, lam)
    tr = Trainer(cfg, Path(outdir) / name)
    t0 = time.time()
    m0 = tr.validate(max_batches=2)
    print(json.dumps({"leg": name, "step": 0,
                      **{k: round(v, 4) for k, v in m0.items()}}),
          flush=True)
    done = 0
    while done < steps:
        tr.fit(max_steps=done + chunk, log_every=200,
               val_every_epochs=10 ** 9)
        done += chunk
        m = tr.validate(max_batches=2)
        tr.ckpt.save(done, tr.state, tr.sampler_state,
                     metrics={"val_ssim": m["ssim"], "val_mae": m["mae"]})
        print(json.dumps({"leg": name, "step": done,
                          "wall_s": round(time.time() - t0, 1),
                          **{k: round(v, 4) for k, v in m.items()}}),
              flush=True)
    tr.ckpt.wait()
    return tr


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    steps_split = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    outdir = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(
        "/tmp/dsdiff_flagship_quality")
    outdir.mkdir(parents=True, exist_ok=True)
    data_dir = outdir / "data"
    if not (data_dir / f"images_tr_{HW}").exists():
        t0 = time.time()
        make_structured_dataset(data_dir, n_cases=36, n_slices=12, hw=HW,
                                seed=0, ts_fraction=1 / 9)
        print(json.dumps({"data": str(data_dir),
                          "gen_s": round(time.time() - t0, 1)}), flush=True)

    results = {}

    # ---- leg 1/2: disentangle A/B at full budget
    for name, lam in (("disen_on", 0.5), ("disen_off", 0.0)):
        tr = train_leg(name, "ds_diff_gaussian", lam, steps, data_dir,
                       outdir)
        res = {}
        tr.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0)
        res["ddim50"] = eval_full_val(tr, f"{name}/ddim50")
        tr.set_sampler(sampler="dpm++", sample_steps=20)
        res["dpm20"] = eval_full_val(tr, f"{name}/dpm20")
        results[name] = res
        tr.ckpt.close()
        del tr

    # ---- leg 3: cached-cond architecture at 256²
    tr = train_leg("split", "ds_diff_split", 0.5, steps_split, data_dir,
                   outdir)
    res = {}
    tr.set_sampler(sampler="ddim", sample_steps=50, cached=True)
    res["cached_ddim50"] = eval_full_val(tr, "split/cached_ddim50")
    tr.set_sampler(sampler="ddim", sample_steps=50, cached=False)
    res["faithful_ddim50"] = eval_full_val(tr, "split/faithful_ddim50")
    results["split"] = res
    tr.ckpt.close()

    if ("disen_on" in results and "disen_off" in results):
        delta = {
            k: round(results["disen_on"]["ddim50"][k]
                     - results["disen_off"]["ddim50"][k], 4)
            for k in ("ssim", "ms_ssim", "psnr")
        }
        results["disen_delta_ddim50"] = delta
    print(json.dumps({"FINAL": results}), flush=True)
    (outdir / "results.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
