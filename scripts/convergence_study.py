"""Extended convergence + quality-parity evidence (VERDICT r1 item 6).

Three legs, all on the live backend (intended for the real TPU chip):

1. ``ds_diff_gaussian`` (flagship 4-stream math) at 64², a few thousand
   steps on the synthetic cond->target task, validating every few epochs —
   SSIM *and* PSNR tracked vs steps, best-val-SSIM checkpoint retention
   exercised (the Orbax best-k path).
2. A shorter 128² leg of the same pipeline (resolution scaling evidence).
3. Cached-conditioning approximation delta: a ``ds_diff_split`` model
   (models/dsunet_cached.py) trained on the same task, then the SAME
   weights sampled two ways — faithful full forward per step vs condition
   features frozen at t_ref=500 — reporting val SSIM/PSNR of both and the
   delta (VERDICT r1 "What's weak" #6).

Usage: python scripts/convergence_study.py [steps64] [steps128] [steps_split]
Results are printed as JSON lines; transcribe into PARITY.md.
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsdiff_tpu.train import Config, Trainer  # noqa: E402
from train_smoke_tpu import make_synthetic  # noqa: E402


def build_cfg(net_mode, hw, data_dir, steps):
    small = hw <= 64
    return Config.wrap(dict(
        net_mode=net_mode,
        train_keys=["A", "B", "C", "GT"],
        h5_2d_img_dir=str(data_dir),
        image_size=hw,
        train_batch_size=16 if small else 8,
        val_batch_size=16 if small else 8,
        fold_K=4, fold_idx=0,
        diffusion_steps=1000,
        parameterization="eps", loss_type="l2",
        disentangle_distance="eu",
        contrast_lambda=0.1,
        unet_config={"params": {
            "model_channels": 48,
            "num_res_blocks": 1,
            "channel_mult": [1, 2, 4] if small else [1, 1, 2, 4],
            "attention_resolutions": [4],
            "num_heads": 4, "use_scale_shift_norm": True}},
        num_epochs=10 ** 9, lr=2e-4,
        sampler_setting={"sampler": "ddim", "sample_steps": 20},
        seed=0, bf16=True, ema_rate=0.999,
        log_images=False,
    ))


def run_leg(name, net_mode, hw, steps, val_chunks=6):
    tmp = Path(tempfile.mkdtemp(prefix=f"dsdiff_conv_{name}_"))
    make_synthetic(tmp, hw=hw)
    cfg = build_cfg(net_mode, hw, tmp, steps)
    tr = Trainer(cfg, tmp / "run")
    history = []
    t0 = time.time()
    m0 = tr.validate(max_batches=2)
    history.append({"step": 0, **{k: round(v, 4) for k, v in m0.items()}})
    chunk = max(steps // val_chunks, 1)
    done_steps = 0
    while done_steps < steps:
        tr.fit(max_steps=done_steps + chunk, log_every=chunk,
               val_every_epochs=10 ** 9)
        done_steps += chunk
        m = tr.validate(max_batches=2)
        tr.ckpt.save(done_steps, tr.state, tr.sampler_state,
                     metrics={"val_ssim": m["ssim"], "val_mae": m["mae"]})
        history.append(
            {"step": done_steps,
             **{k: round(v, 4) for k, v in m.items()}})
        print(json.dumps({"leg": name, **history[-1]}), flush=True)
    tr.ckpt.wait()
    try:
        best = tr.ckpt.best_step()
    except Exception:
        best = None
    try:
        kept = sorted(int(s) for s in tr.ckpt._mgr.all_steps())
    except Exception:
        kept = []
    out = {
        "leg": name, "net_mode": net_mode, "hw": hw, "steps": steps,
        "history": history, "wall_s": round(time.time() - t0, 1),
        "best_ckpt_step": best,
        "ckpt_steps": kept,
    }
    print(json.dumps(out), flush=True)
    return tr, tmp, out


def cached_delta(tr):
    """Sample the trained ds_diff_split model with faithful vs cached
    conditioning (same EMA weights) and report the val metric delta.

    ``tr.sample_fn`` is already the cached-cond path (trainer wires
    _make_cached_sample_fn for net_mode ds_diff_split); the faithful
    comparator runs the model's full __call__ every step."""
    from dsdiff_tpu.train.step import make_sample_fn

    params = tr.state.ema_params
    faithful_fn = make_sample_fn(tr.model.apply, tr.rsched, tr.task, "ddim")
    rng = jax.random.PRNGKey(0)
    tot = {"faithful_ssim": 0.0, "cached_ssim": 0.0,
           "faithful_psnr": 0.0, "cached_psnr": 0.0}
    n = 0
    for i, batch in enumerate(tr.val_loader.epoch(0)):
        if i >= 2:
            break
        cond = jnp.asarray(batch["image"])
        rng, srng = jax.random.split(rng)
        preds = {
            "faithful": faithful_fn(params, cond, srng),
            "cached": tr.sample_fn(params, cond, srng),
        }
        for tag, pred in preds.items():
            m = jax.device_get(tr.val_metrics(
                pred, jnp.asarray(batch["target"]),
                jnp.asarray(batch["valid"])))
            tot[f"{tag}_ssim"] += float(m["ssim"])
            tot[f"{tag}_psnr"] += float(m["psnr"])
        n += 1
    out = {k: round(v / max(n, 1), 4) for k, v in tot.items()}
    out["ssim_delta"] = round(out["faithful_ssim"] - out["cached_ssim"], 4)
    out["psnr_delta"] = round(out["faithful_psnr"] - out["cached_psnr"], 4)
    print(json.dumps({"leg": "cached_delta", **out}), flush=True)
    return out


def main():
    steps64 = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    steps128 = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    steps_split = int(sys.argv[3]) if len(sys.argv) > 3 else 1500

    tr, _, _ = run_leg("flagship64", "ds_diff_gaussian", 64, steps64)
    tr.ckpt.close()
    tr2, _, _ = run_leg("flagship128", "ds_diff_gaussian", 128, steps128,
                        val_chunks=4)
    tr2.ckpt.close()
    tr3, _, _ = run_leg("split64", "ds_diff_split", 64, steps_split,
                        val_chunks=3)
    cached_delta(tr3)
    tr3.ckpt.close()


if __name__ == "__main__":
    main()
