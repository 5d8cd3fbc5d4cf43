"""Disentanglement under style shift — the A/B the reference's claim needs.

The flagship-scale 256² A/B (scripts/flagship_quality.py, PARITY.md) found
contrast_lambda>0 COSTS quality on the mild structured task: its scalar
per-case styles are learnable by plain intensity invariance, so the
disentangle constraint only consumes capacity. The reference's +0.56 dB
claim (DOCUMENTATION_UPDATE_SUMMARY.md:181) is made on real multi-center
MRI, whose nuisance is high-dimensional (coil bias fields, scanner
gammas) and whose evaluation cases come from centers unseen in training.
This experiment reconstructs that regime synthetically
(data/synthetic.STYLE_PROFILES):

  * train cases : 'hard'    — spatial bias fields (amp 0.15-0.3),
                  gamma 0.45-1.1, per-case lesion gain in B
  * ID val      : 'hard'    — unseen cases, same style ranges
  * OOD val     : 'hard_ood'— gamma 1.4-2.2, field amp 0.35-0.5
                  (disjoint from training — the multi-center analogue)

Legs: ds_diff_gaussian (the flagship math) at contrast_lambda in
{0.5 (reference default, train_config.yaml:35), 0.05, 0.0}, same
data/seed/budget, 64². Each leg is evaluated with DDIM-50 on BOTH val
folds; the quantity under test is the OOD delta (and the OOD-ID
generalization gap) of lambda>0 vs lambda=0.

The result is reported as measured, whichever sign it has.

Usage: python scripts/disen_ood.py [steps] [outdir]
Emits JSON lines; transcribe into PARITY.md.
"""
import json
import subprocess
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

from dsdiff_tpu.data import h5store  # noqa: E402
from dsdiff_tpu.data.synthetic import (  # noqa: E402
    make_structured_case, make_structured_dataset,
)
from dsdiff_tpu.eval import metrics as M  # noqa: E402
from dsdiff_tpu.train import Config, Trainer  # noqa: E402

HW = 64
BATCH = 16
LAMBDAS = {"lam0.5": 0.5, "lam0.05": 0.05, "lam0": 0.0}


def ensure_data(outdir):
    """tr='hard', ts='hard_ood', plus an explicit ID-val dir ('hard',
    unseen cases) so the generalization gap is measurable."""
    data_dir = Path(outdir) / "data"
    if not (data_dir / f"images_tr_{HW}").exists():
        t0 = time.time()
        make_structured_dataset(
            data_dir, n_cases=48, n_slices=8, hw=HW, seed=0,
            ts_fraction=0.25, style_profile="hard",
            ts_style_profile="hard_ood")
        # ID-val: fresh cases (disjoint seeds), training style ranges
        rng = np.random.default_rng(10_000)
        for ci in range(12):
            case_rng = np.random.default_rng(rng.integers(2 ** 63))
            slices = make_structured_case(HW, case_rng, 8,
                                          style_profile="hard")
            for si, arrays in enumerate(slices):
                h5store.write_slice(
                    data_dir / f"images_id_{HW}" / f"case{ci:03d}"
                    / f"layer_{si}.h5", arrays)
        print(json.dumps({"data": str(data_dir),
                          "gen_s": round(time.time() - t0, 1)}), flush=True)
    return data_dir


def build_cfg(data_dir, lam, val_split):
    return Config.wrap(dict(
        net_mode="ds_diff_gaussian",
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(data_dir),
        image_size=HW,
        train_batch_size=BATCH, val_batch_size=BATCH,
        val_split=val_split,
        diffusion_steps=1000,
        parameterization="v", loss_type="charbonnier",
        learn_sigma=True,
        disentangle_distance="eu",
        contrast_lambda=lam,
        unet_config={"params": {
            "model_channels": 96,
            "num_res_blocks": 2,
            "channel_mult": [1, 2, 2, 3],
            "attention_resolutions": [8, 16],
            "num_head_channels": 48,
            "use_scale_shift_norm": True}},
        num_epochs=10 ** 9, lr=1e-4, lr_warm_epoch=0,
        sampler_setting={"sampler": "ddim", "sample_steps": 50},
        seed=0, bf16=True, ema_rate=0.999,
        log_images=False,
        keep_checkpoints=2,
    ))


def eval_full_val(tr, tag):
    rng = jax.random.PRNGKey(7)
    rows = []
    t0 = time.time()
    for batch in tr.val_loader.epoch(0):
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
            mse = float(np.mean((gt[b, ..., 0] - pred[b, ..., 0]) ** 2))
            rows.append({
                "ssim": float(M.ssim(t1, p1, data_range=2.0)[0]),
                "psnr": 10.0 * np.log10(4.0 / max(mse, 1e-12)),
                "mae": M.mae(gt[b, ..., 0], pred[b, ..., 0]),
            })
    out = {k: round(float(np.mean([r[k] for r in rows])), 4) for k in rows[0]}
    out.update(n_slices=len(rows), eval_s=round(time.time() - t0, 1))
    print(json.dumps({"eval": tag, **out}), flush=True)
    return out


def run_leg(name, steps, outdir):
    """Train one lambda leg, then DDIM-50 eval on OOD and ID val folds."""
    data_dir = ensure_data(outdir)
    lam = LAMBDAS[name]
    tr = Trainer(build_cfg(data_dir, lam, f"images_ts_{HW}"),
                 Path(outdir) / name)
    if tr.ckpt.latest_step() is not None:
        tr.state, tr.sampler_state = tr.ckpt.restore(
            tr.state, tr.sampler_state)
    done = int(jax.device_get(tr.state.step))
    t0 = time.time()
    if done < steps:
        tr.fit(max_steps=steps, log_every=200, val_every_epochs=10 ** 9)
        m = tr.validate(max_batches=2)
        tr.ckpt.save(steps, tr.state, tr.sampler_state,
                     metrics={"val_ssim": m["ssim"], "val_mae": m["mae"]})
        tr.ckpt.wait()
    print(json.dumps({"leg": name, "trained_to": steps,
                      "train_s": round(time.time() - t0, 1)}), flush=True)
    tr.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0)
    res = {"ood": eval_full_val(tr, f"{name}/ood")}
    tr.ckpt.close()
    # same checkpoint, ID val fold
    tr_id = Trainer(build_cfg(data_dir, lam, f"images_id_{HW}"),
                    Path(outdir) / name)
    tr_id.state, tr_id.sampler_state = tr_id.ckpt.restore(
        tr_id.state, tr_id.sampler_state)
    tr_id.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0)
    res["id"] = eval_full_val(tr_id, f"{name}/id")
    tr_id.ckpt.close()
    return res


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "leg":
        name, steps, outdir = sys.argv[2], int(sys.argv[3]), sys.argv[4]
        res = run_leg(name, steps, Path(outdir))
        print(json.dumps({"leg_done": name, **res}), flush=True)
        return
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    outdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        "/tmp/dsdiff_disen_ood")
    outdir.mkdir(parents=True, exist_ok=True)
    ensure_data(outdir)
    me = str(Path(__file__).resolve())
    results = {}
    for name in LAMBDAS:
        r = subprocess.run(
            [sys.executable, me, "leg", name, str(steps), str(outdir)],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        sys.stdout.flush()
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise SystemExit(f"leg {name} failed rc={r.returncode}")
        for line in r.stdout.strip().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "leg_done" in rec:
                results[rec["leg_done"]] = {
                    "ood": rec["ood"], "id": rec["id"]}
    if "lam0" in results:
        for name in ("lam0.5", "lam0.05"):
            if name not in results:
                continue
            results[f"{name}_delta"] = {
                f"{fold}_{k}": round(
                    results[name][fold][k] - results["lam0"][fold][k], 4)
                for fold in ("ood", "id") for k in ("ssim", "psnr")
            }
    print(json.dumps({"FINAL": results}), flush=True)
    (Path(outdir) / "results.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
