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

Usage: python scripts/flagship_quality.py [leg=steps ...] [outdir]
       (legacy: python scripts/flagship_quality.py [steps] [steps_split]
        [outdir])
With no leg pairs, runs the r4 default campaign: split=4000
split_exact=6000 c128=3000 disen_off=5000 disen_mid=5000 disen_on=5000 —
cached-cond integrity legs first, then the equal-budget lambda table.
Results flush to <outdir>/results.json after every leg; a re-run skips
already-evaluated legs. Emits JSON lines; transcribe into PARITY.md.
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


def build_cfg(net_mode, data_dir, lam, model_channels=96,
              num_head_channels=48, **unet_extra):
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
            "model_channels": model_channels,
            "num_res_blocks": 2,
            "channel_mult": [1, 1, 2, 2, 3, 3],
            "attention_resolutions": [8, 16, 32],
            "num_head_channels": num_head_channels,
            "use_scale_shift_norm": True, **unet_extra}},
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


LEGS = {"disen_on": ("ds_diff_gaussian", 0.5),   # reference default lambda
        "disen_mid": ("ds_diff_gaussian", 0.05),  # lambda-scale probe
        "disen_off": ("ds_diff_gaussian", 0.0),
        "split": ("ds_diff_split", 0.5),
        # the TPU-recommended width (configs/dsdiff_flagship128.yaml,
        # PROFILE.md §9: 58.9% MFU vs 38.3% at C=96) at the same budget
        # as disen_off — the quality datapoint for that operating point
        "c128": ("ds_diff_gaussian", 0.0, dict(model_channels=128,
                                               num_head_channels=32)),
        # cond encoders pinned to one reference embedding during TRAINING
        # (models/dsunet_cached.cond_t_ref), making the sampling-time
        # cache exact — the fix for the -7 dB cached/faithful gap the
        # plain split leg measured at 256²
        "split_exact": ("ds_diff_split", 0.5, dict(cond_t_ref=500.0))}


def _make_trainer(name, data_dir, outdir, restore=True):
    net_mode, lam = LEGS[name][:2]
    extra = LEGS[name][2] if len(LEGS[name]) > 2 else {}
    tr = Trainer(build_cfg(net_mode, data_dir, lam, **extra),
                 Path(outdir) / name)
    if restore and tr.ckpt.latest_step() is not None:
        tr.state, tr.sampler_state = tr.ckpt.restore(
            tr.state, tr.sampler_state)
    return tr


def train_chunk(name, target, data_dir, outdir, chunk=3000):
    """Train ONE <=chunk-step slice of a leg in THIS process, then exit.

    The axon tunnel client leaks every host->device transfer buffer
    (~batch_bytes per train step — measured 8.4 MB/step at 256^2 b=8,
    which OOM-killed the original single-process 10k-step run at ~125 GB
    RSS). Until the platform bug is fixed, long runs are driven as chunked
    subprocesses: restore latest Orbax checkpoint -> train <=chunk steps ->
    save -> exit, bounding the leak at ~chunk*batch_bytes per process
    lifetime (~25 GB at chunk=3000). chunk=1000 measured ~12 min of
    restore/compile overhead against ~3.5 min of training — 3000 amortizes
    it to ~25%. Returns the step reached.
    """
    tr = _make_trainer(name, data_dir, outdir)
    t0 = time.time()
    done = int(jax.device_get(tr.state.step))
    if done == 0:
        m0 = tr.validate(max_batches=2)
        print(json.dumps({"leg": name, "step": 0,
                          **{k: round(v, 4) for k, v in m0.items()}}),
              flush=True)
    until = min(done + chunk, target)
    # Save every sub_chunk steps (not only at chunk end): the shared axon
    # tunnel's throughput varies 0.3-5 steps/s, so the outer wall-clock
    # timeout can fire mid-chunk — periodic saves bound the lost work to
    # <=sub_chunk steps instead of the whole chunk.
    sub_chunk = 500
    reached = done
    while reached < until:
        nxt = min(reached + sub_chunk, until)
        tr.fit(max_steps=nxt, log_every=200, val_every_epochs=10 ** 9,
               val_on_done=False)  # the loop below does its own val+save
        m = tr.validate(max_batches=2)
        tr.ckpt.save(nxt, tr.state, tr.sampler_state,
                     metrics={"val_ssim": m["ssim"], "val_mae": m["mae"]})
        print(json.dumps({"leg": name, "step": nxt,
                          "wall_s": round(time.time() - t0, 1),
                          **{k: round(v, 4) for k, v in m.items()}}),
              flush=True)
        reached = nxt
    tr.ckpt.wait()
    tr.ckpt.close()
    return until


def eval_leg(name, data_dir, outdir):
    """Full-val evals of a trained leg's latest checkpoint (own process)."""
    tr = _make_trainer(name, data_dir, outdir)
    res = {"step": int(jax.device_get(tr.state.step))}
    if LEGS[name][0] == "ds_diff_split":
        tr.set_sampler(sampler="ddim", sample_steps=50, cached=True)
        res["cached_ddim50"] = eval_full_val(tr, f"{name}/cached_ddim50")
        tr.set_sampler(sampler="ddim", sample_steps=50, cached=False)
        res["faithful_ddim50"] = eval_full_val(tr, f"{name}/faithful_ddim50")
    else:
        tr.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0)
        res["ddim50"] = eval_full_val(tr, f"{name}/ddim50")
        tr.set_sampler(sampler="dpm++", sample_steps=20)
        res["dpm20"] = eval_full_val(tr, f"{name}/dpm20")
    tr.ckpt.close()
    return res


def ensure_data(outdir):
    data_dir = Path(outdir) / "data"
    if not (data_dir / f"images_tr_{HW}").exists():
        t0 = time.time()
        make_structured_dataset(data_dir, n_cases=36, n_slices=12, hw=HW,
                                seed=0, ts_fraction=1 / 9)
        print(json.dumps({"data": str(data_dir),
                          "gen_s": round(time.time() - t0, 1)}), flush=True)
    return data_dir


def drive(targets, outdir):
    """Outer driver: one subprocess per <=1000-step chunk / per eval (see
    train_chunk's docstring for why — axon transfer-buffer leak).

    ``targets`` is an ordered {leg: step_budget} dict — r4 runs the
    integrity-critical legs (split / split_exact: the cached-cond ~7 dB
    story) FIRST so a mid-campaign stall strands the least important
    evidence. Results are flushed to <outdir>/results.json after EVERY
    leg (r3 lost its whole second half to an end-of-round /tmp wipe)."""
    import subprocess

    me = str(Path(__file__).resolve())
    results = {}
    results_path = Path(outdir) / "results.json"
    if results_path.exists():  # resume a prior campaign's transcribed legs
        results = json.loads(results_path.read_text())
    for name, target in targets.items():
        if name in results:
            print(json.dumps({"skip": name, "reason": "already evaluated"}),
                  flush=True)
            continue
        fails = 0
        while True:
            r = subprocess.run(
                [sys.executable, me, "chunk", name, str(target),
                 str(outdir)], capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            sys.stdout.flush()
            if r.returncode != 0:
                # tunnel flake: the chunk restores from its last periodic
                # save, so a failure loses <=sub_chunk steps — retry with
                # backoff instead of killing the whole campaign (r3 died
                # to exactly this)
                fails += 1
                sys.stderr.write(r.stderr[-4000:])
                if fails > 8:
                    raise SystemExit(f"chunk {name} failed {fails}x")
                time.sleep(min(60 * fails, 300))
                continue
            fails = 0
            reached = int(r.stdout.strip().splitlines()[-1])
            if reached >= target:
                break
        fails = 0
        while True:
            r = subprocess.run(
                [sys.executable, me, "eval", name, str(outdir)],
                capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            sys.stdout.flush()
            if r.returncode == 0:
                break
            fails += 1
            sys.stderr.write(r.stderr[-4000:])
            if fails > 4:
                raise SystemExit(f"eval {name} failed {fails}x")
            time.sleep(min(60 * fails, 300))
        for line in r.stdout.strip().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "eval" in rec:
                leg, tag = rec.pop("eval").split("/")
                results.setdefault(leg, {})[tag] = rec
        results_path.write_text(json.dumps(results, indent=2))
    for leg in ("disen_on", "disen_mid"):
        if leg in results and "disen_off" in results:
            results[f"{leg}_delta_ddim50"] = {
                k: round(results[leg]["ddim50"][k]
                         - results["disen_off"]["ddim50"][k], 4)
                for k in ("ssim", "ms_ssim", "psnr")
            }
    print(json.dumps({"FINAL": results}), flush=True)
    (Path(outdir) / "results.json").write_text(json.dumps(results, indent=2))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "chunk":
        name, target = sys.argv[2], int(sys.argv[3])
        outdir = Path(sys.argv[4])
        reached = train_chunk(name, target, ensure_data(outdir), outdir)
        print(reached, flush=True)  # last line: step reached (driver parses)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "eval":
        name, outdir = sys.argv[2], Path(sys.argv[3])
        print(json.dumps({"leg_eval_done": name,
                          **eval_leg(name, ensure_data(outdir), outdir)}),
              flush=True)
        return
    # drive mode: positional args are either ``leg=steps`` pairs (run in
    # the given order) or the legacy ``[steps] [steps_split] [outdir]``
    # triple. r4 default: integrity-critical legs first, equal-budget
    # disentangle table (VERDICT r3 items 1 + 8).
    argv = sys.argv[1:]
    outdir = Path("/root/repo/artifacts/fq_r4")
    targets = {}
    legacy = []
    for a in argv:
        if "=" in a:
            leg, v = a.split("=", 1)
            assert leg in LEGS, f"unknown leg {leg!r}"
            targets[leg] = int(v)
        elif a.isdigit():
            legacy.append(int(a))
        else:
            outdir = Path(a)
    if legacy:
        steps = legacy[0]
        steps_split = legacy[1] if len(legacy) > 1 else 6000
        targets = {"disen_on": steps, "disen_off": steps,
                   "split": steps_split, "disen_mid": steps,
                   "split_exact": steps_split, "c128": steps}
    elif not targets:
        targets = {"split": 4000, "split_exact": 6000, "c128": 3000,
                   "disen_off": 5000, "disen_mid": 5000, "disen_on": 5000}
    outdir.mkdir(parents=True, exist_ok=True)
    ensure_data(outdir)
    drive(targets, outdir)


if __name__ == "__main__":
    main()
