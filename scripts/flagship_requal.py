"""Re-score the flagship-quality checkpoints with the fixed SSIM metric.

The round-3 256^2 flagship run surfaced a metric bug: TPU convs default to
bf16 MXU passes, so the SSIM moment cancellation mu_tt - mu_t^2 went
negative on saturated regions and SSIM read > 1 (see eval/metrics._filter2d).
The training run itself is unaffected (the metric is eval-only); this script
reloads each completed leg's latest checkpoint and re-runs the full-val-fold
evals with the corrected metric, so PARITY.md records honest numbers without
re-burning ~2.5 h of chip time.

Usage: python scripts/flagship_requal.py [outdir=/tmp/dsdiff_flagship_quality]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsdiff_tpu.train import Trainer  # noqa: E402

import flagship_quality as fq  # noqa: E402


def requal_leg(name, net_mode, lam, outdir):
    workdir = Path(outdir) / name
    if not (workdir / "checkpoint").exists():
        print(json.dumps({"leg": name, "skip": "no checkpoint"}), flush=True)
        return None
    cfg = fq.build_cfg(net_mode, Path(outdir) / "data", lam)
    tr = Trainer(cfg, workdir)
    tr.state, tr.sampler_state = tr.ckpt.restore(tr.state, tr.sampler_state)
    step = int(jax.device_get(tr.state.step))
    print(json.dumps({"leg": name, "restored_step": step}), flush=True)
    res = {"step": step}
    if net_mode == "ds_diff_split":
        tr.set_sampler(sampler="ddim", sample_steps=50, cached=True)
        res["cached_ddim50"] = fq.eval_full_val(tr, f"{name}/cached_ddim50")
        tr.set_sampler(sampler="ddim", sample_steps=50, cached=False)
        res["faithful_ddim50"] = fq.eval_full_val(
            tr, f"{name}/faithful_ddim50")
    else:
        tr.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0)
        res["ddim50"] = fq.eval_full_val(tr, f"{name}/ddim50")
        tr.set_sampler(sampler="dpm++", sample_steps=20)
        res["dpm20"] = fq.eval_full_val(tr, f"{name}/dpm20")
    tr.ckpt.close()
    del tr
    return res


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "/tmp/dsdiff_flagship_quality")
    results = {}
    for name, mode, lam in (("disen_on", "ds_diff_gaussian", 0.5),
                            ("disen_off", "ds_diff_gaussian", 0.0),
                            ("split", "ds_diff_split", 0.5)):
        res = requal_leg(name, mode, lam, outdir)
        if res:
            results[name] = res
    if "disen_on" in results and "disen_off" in results:
        results["disen_delta_ddim50"] = {
            k: round(results["disen_on"]["ddim50"][k]
                     - results["disen_off"]["ddim50"][k], 4)
            for k in ("ssim", "ms_ssim", "psnr")
        }
    print(json.dumps({"FINAL_REQUAL": results}), flush=True)
    (outdir / "results_requal.json").write_text(
        json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
