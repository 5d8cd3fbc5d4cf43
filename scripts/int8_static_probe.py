"""Static-calibration int8: measure PROFILE.md §10's stated flip condition.

Round 3 rejected *dynamic* int8 inference (0.84x end-to-end on v5e: the
per-call max-abs activation reduction breaks XLA's conv fusions) and
claimed the tradeoff "flips where activation scales are static". This
probe measures that claim instead of shipping it unmeasured
(VERDICT r3 item 6):

  1. calibrate per-conv activation scales on denoiser forwards at several
     noise levels (ops/quant.calibrate_act_scales — scales become
     compile-time constants; the runtime reduction disappears),
  2. time the flagship 256² DDIM-50 chain: bf16 vs dynamic-int8 vs
     static-int8, same batch, fresh-RNG device_get-barrier timing
     (bench.py methodology),
  3. report speedups; accept/reject goes into PROFILE.md §10.

Usage: python scripts/int8_static_probe.py [batch]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dsdiff_tpu.core import schedules
from dsdiff_tpu.models import DSUNet
from dsdiff_tpu.ops.quant import calibrate_act_scales, wrap_quantized
from dsdiff_tpu.train.step import TaskConfig, make_sample_fn

H = 256
STEPS = 50


def _fetch(out):
    return float(np.asarray(jnp.sum(out.reshape(-1)[:1])))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    model = DSUNet(
        in_channels=4, model_channels=96, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, H, H, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 1000)
    rsched = schedules.respace(
        betas, schedules.space_timesteps(1000, str(STEPS)))
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      learn_sigma=True)
    cond = jax.random.normal(jax.random.PRNGKey(1), (batch, H, H, 3))

    # ---- calibration: denoiser forwards at 5 noise levels
    t0 = time.time()
    cal_inputs = []
    rng = jax.random.PRNGKey(5)
    for t in (25, 250, 500, 750, 975):
        rng, k = jax.random.split(rng)
        x_t = jax.random.normal(k, (batch, H, H, 1))
        cal_inputs.append((params,
                           jnp.concatenate([x_t, cond], -1),
                           jnp.full((batch,), float(t))))
    scales = calibrate_act_scales(model.apply, cal_inputs)
    print(json.dumps({"calibrated_convs": len(scales),
                      "calib_s": round(time.time() - t0, 1)}), flush=True)

    results = {}
    for name, apply_fn in [
        ("bf16", model.apply),
        ("int8_dynamic", wrap_quantized(model.apply)),
        ("int8_static", wrap_quantized(model.apply, act_scales=scales)),
    ]:
        sample_fn = make_sample_fn(apply_fn, rsched, task, "ddim")
        rng = jax.random.PRNGKey(2)
        _fetch(sample_fn(params, cond, rng))  # compile
        best = 1e9
        for i in range(3):
            r = jax.random.fold_in(rng, i)
            t1 = time.perf_counter()
            _fetch(sample_fn(params, cond, r))
            best = min(best, time.perf_counter() - t1)
        results[name] = best
        print(json.dumps({
            "path": name,
            "sample_latency_s": round(best, 3),
            "slices_per_sec": round(batch / best, 3),
        }), flush=True)
    print(json.dumps({
        "FINAL": {
            "batch": batch,
            "dynamic_vs_bf16": round(results["bf16"]
                                     / results["int8_dynamic"], 3),
            "static_vs_bf16": round(results["bf16"]
                                    / results["int8_static"], 3),
            "static_vs_dynamic": round(results["int8_dynamic"]
                                       / results["int8_static"], 3),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
