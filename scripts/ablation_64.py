"""64² training-knob ablations the reference measures or ships unmeasured.

Three axes, one shared baseline, same data/seed/budget each
(VERDICT r3 items 4 + 9):

* **edge guidance** (`use_edge: sobel`) — the reference's EG ablation axis
  (model_architecture_thesis.md:385-392: base NRMSE 0.0831 / PSNR 22.18 →
  +EG 0.0775 / 22.74; edge maps training_project/utils/my_transform.py:
  29-139). A Sobel edge channel of the condition stack is appended as an
  extra conditioning stream.
* **loss-second-moment schedule sampler** (`schedule_sampler:
  loss-second-moment`) — the reference's importance sampler
  (Disc_diff/guided_diffusion/resample.py:124 LossSecondMomentResampler),
  implemented in train/schedule_sampler.loss2_init but never before used
  in a recorded run.
* **shannon-entropy warm-up curriculum** (`shannon: true`) — the
  reference's entropy curriculum (train_util.py:192-228 /
  trainer_use_gaussian_diff.py:172-234), data/curriculum.py, likewise
  recorded here for the first time.

Task: the structured synthetic multi-contrast set ('hard' style profile —
bias fields + gamma + lesion gain, the most realistic of the synthetic
regimes) at 64², ds_diff_gaussian flagship math, contrast_lambda=0
(the measured-best flat-task setting, PARITY.md), DDIM-50 full-val eval.

Usage: python scripts/ablation_64.py [leg=steps ...] [outdir]
Default: base=6000 edge_sobel=6000 loss2=6000 shannon=6000
Results flush to <outdir>/results.json after every leg.
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

from dsdiff_tpu.data.synthetic import make_structured_dataset  # noqa: E402
from dsdiff_tpu.eval import metrics as M  # noqa: E402
from dsdiff_tpu.train import Config, Trainer  # noqa: E402

HW = 64
BATCH = 16

# leg -> config overrides
LEGS = {
    "base": {},
    "edge_sobel": {"use_edge": "sobel"},
    "loss2": {"schedule_sampler": "loss-second-moment"},
    "shannon": {"shannon": True, "shannon_warmup_steps": 2000},
    # VERDICT r4 item 8: the device-resident data path in a RECORDED
    # end-to-end hardware training run (until now proven only by probes +
    # unit tests). Kept as its OWN leg rather than folded into loss2: the
    # cache samples uniform-with-replacement on device, a different stream
    # than the host loader's shuffled epochs, so folding it in would
    # confound the loss2-vs-base delta. Its result is therefore read as
    # "devcache trains to parity", not as part of the sampler ablation.
    "loss2_devcache": {"schedule_sampler": "loss-second-moment",
                       "device_data_cache": True},
}


def build_cfg(data_dir, **extra):
    base = dict(
        net_mode="ds_diff_gaussian",
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(data_dir),
        image_size=HW,
        train_batch_size=BATCH, val_batch_size=BATCH,
        fold_K=4, fold_idx=0,
        diffusion_steps=1000,
        parameterization="v", loss_type="charbonnier",
        learn_sigma=True,
        disentangle_distance="eu",
        contrast_lambda=0.0,
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
    )
    base.update(extra)
    return Config.wrap(base)


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
                "nrmse": float(np.sqrt(mse) / max(
                    np.sqrt(np.mean(gt[b, ..., 0] ** 2)), 1e-12)),
                "mae": M.mae(gt[b, ..., 0], pred[b, ..., 0]),
            })
    out = {k: round(float(np.mean([r[k] for r in rows])), 4)
           for k in rows[0]}
    out.update(n_slices=len(rows), eval_s=round(time.time() - t0, 1))
    print(json.dumps({"eval": tag, **out}), flush=True)
    return out


def ensure_data(outdir):
    data_dir = Path(outdir) / "data"
    if not (data_dir / f"images_tr_{HW}").exists():
        t0 = time.time()
        make_structured_dataset(data_dir, n_cases=48, n_slices=8, hw=HW,
                                seed=0, ts_fraction=0.25,
                                style_profile="hard")
        print(json.dumps({"data": str(data_dir),
                          "gen_s": round(time.time() - t0, 1)}), flush=True)
    return data_dir


def run_leg(name, steps, outdir):
    data_dir = ensure_data(outdir)
    tr = Trainer(build_cfg(data_dir, **LEGS[name]), Path(outdir) / name)
    if tr.ckpt.latest_step() is not None:
        tr.state, tr.sampler_state = tr.ckpt.restore(
            tr.state, tr.sampler_state)
    done = int(jax.device_get(tr.state.step))
    t0 = time.time()
    if done < steps:
        tr.fit(max_steps=steps, log_every=200, val_every_epochs=10 ** 9,
               val_on_done=False)
        m = tr.validate(max_batches=2)
        tr.ckpt.save(steps, tr.state, tr.sampler_state,
                     metrics={"val_ssim": m["ssim"], "val_mae": m["mae"]})
        tr.ckpt.wait()
    print(json.dumps({"leg": name, "trained_to": steps,
                      "train_s": round(time.time() - t0, 1)}), flush=True)
    tr.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0)
    res = {"val": eval_full_val(tr, f"{name}/val")}
    if name.startswith("loss2"):
        # evidence the importance sampler actually warmed up and skews:
        # history filled + non-uniform pmf
        st = jax.device_get(tr.sampler_state)
        warmed = bool(np.all(np.asarray(st.loss_counts)
                             == st.history_per_term))
        w = np.sqrt(np.mean(np.asarray(st.loss_history) ** 2, axis=-1))
        p = w / max(w.sum(), 1e-12)
        res["sampler"] = {
            "warmed": warmed,
            "pmf_max_over_uniform": round(float(p.max() * len(p)), 3),
            "pmf_min_over_uniform": round(float(p.min() * len(p)), 3),
        }
        print(json.dumps({"loss2_state": res["sampler"]}), flush=True)
    tr.ckpt.close()
    return res


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "leg":
        name, steps, outdir = sys.argv[2], int(sys.argv[3]), sys.argv[4]
        res = run_leg(name, steps, Path(outdir))
        print(json.dumps({"leg_done": name, **res}), flush=True)
        return
    outdir = Path("/root/repo/artifacts/ablation64_r4")
    targets = {}
    for a in sys.argv[1:]:
        if "=" in a:
            leg, v = a.split("=", 1)
            assert leg in LEGS, f"unknown leg {leg!r}"
            targets[leg] = int(v)
        else:
            outdir = Path(a)
    if not targets:
        targets = {"base": 6000, "edge_sobel": 6000,
                   "loss2": 6000, "shannon": 6000,
                   "loss2_devcache": 6000}
    outdir.mkdir(parents=True, exist_ok=True)
    ensure_data(outdir)
    me = str(Path(__file__).resolve())
    results_path = outdir / "results.json"
    results = (json.loads(results_path.read_text())
               if results_path.exists() else {})
    for name, steps in targets.items():
        if name in results:
            print(json.dumps({"skip": name}), flush=True)
            continue
        fails = 0
        while True:
            r = subprocess.run(
                [sys.executable, me, "leg", name, str(steps), str(outdir)],
                capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            sys.stdout.flush()
            if r.returncode == 0:
                break
            fails += 1
            sys.stderr.write(r.stderr[-4000:])
            if fails > 6:
                raise SystemExit(f"leg {name} failed {fails}x")
            time.sleep(min(60 * fails, 300))
        for line in r.stdout.strip().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "leg_done" in rec:
                results[rec["leg_done"]] = {
                    k: v for k, v in rec.items() if k != "leg_done"}
        results_path.write_text(json.dumps(results, indent=2))
    if "base" in results:
        for name in ("edge_sobel", "loss2", "shannon",
                     "loss2_devcache"):
            if name in results:
                results[f"{name}_delta"] = {
                    k: round(results[name]["val"][k]
                             - results["base"]["val"][k], 4)
                    for k in ("ssim", "psnr", "nrmse")}
    results_path.write_text(json.dumps(results, indent=2))
    print(json.dumps({"FINAL": results}), flush=True)


if __name__ == "__main__":
    main()
