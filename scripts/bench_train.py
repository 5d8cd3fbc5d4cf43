"""Training-throughput bench: flagship DSUnet train step at 256^2.

Reports steps/sec/chip and slices/sec for the full jitted training step
(charbonnier + VLB + C-S/S-A-L disentangle, EMA, AdamW) — the BASELINE.json
first-class training metric.
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

from dsdiff_tpu.core import schedules
from dsdiff_tpu.models import DSUNet
from dsdiff_tpu.train import TrainState, make_optimizer
from dsdiff_tpu.train import schedule_sampler as ss
from dsdiff_tpu.train.step import TaskConfig, make_train_step

H = 256


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = len(sys.argv) < 3 or sys.argv[2] != "noremat"
    model = DSUNet(
        in_channels=4, model_channels=96, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
        use_scale_shift_norm=True, remat=remat, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, H, H, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    sched = schedules.DiffusionSchedule.named("linear", 1000)
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      learn_sigma=True, feature_kind="ds",
                      disentangle_mode="eu", disen_lambda=0.5)
    state = TrainState.create(model.apply, params, make_optimizer(1e-4))
    sampler = ss.uniform_init(1000)
    step_fn = make_train_step(task, sched, donate=True)
    batch_data = {
        "target": jax.random.normal(jax.random.PRNGKey(1), (batch, H, H, 1)),
        "image": jax.random.normal(jax.random.PRNGKey(2), (batch, H, H, 3)),
    }
    import numpy as np

    def fetch(v):
        # device_get barrier: block_until_ready alone can return before the
        # tunneled device finishes (PROFILE.md §1)
        return float(np.asarray(v["loss"]))

    rng = jax.random.PRNGKey(3)
    state, sampler, m = step_fn(state, sampler, batch_data, rng)
    fetch(m)
    # successive steps consume the previous state (donated), so the chain is
    # data-dependent and cannot overlap or be served from a dispatch cache
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, sampler, m = step_fn(state, sampler, batch_data, rng)
    fetch(m)
    dt = (time.perf_counter() - t0) / n
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k_src, k_out in (("bytes_in_use", "hbm_in_use_gb"),
                             ("peak_bytes_in_use", "hbm_peak_gb")):
            if k_src in stats:
                mem[k_out] = round(stats[k_src] / 2**30, 2)
    except Exception:
        pass
    # ---- training-side FLOP accounting (VERDICT r2 item 5): analytic
    # fwd FLOPs from the same component model the inference MFU study
    # cross-validated against XLA (PROFILE.md §2 — the two accountings
    # agree within 0.1%), times the standard fwd+bwd multiplier:
    #   bwd = dL/dW (1x fwd) + dL/dx (1x fwd)  =>  train = 3x fwd
    # MFU uses ALGORITHMIC FLOPs (3x) per convention — remat recompute
    # (+1x fwd) is counted separately as hardware FLOPs.
    from mfu_probe import dsunet_forward_flops

    fwd_f = dsunet_forward_flops(batch)
    algo_f = 3.0 * fwd_f
    hw_f = algo_f + (fwd_f if remat else 0.0)
    peak = 197e12  # TPU v5e bf16 peak
    print(json.dumps({
        "metric": "dsunet_256_train_steps_per_sec_per_chip",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s/chip",
        "slices_per_sec": round(batch / dt, 2),
        "batch": batch,
        "step_latency_s": round(dt, 4),
        "remat": remat,
        "loss": float(m["loss"]),
        "fwd_gflops_batch": round(fwd_f / 1e9, 1),
        "train_tflops_per_sec": round(algo_f / dt / 1e12, 2),
        "train_mfu_pct": round(100.0 * algo_f / dt / peak, 2),
        "hw_tflops_per_sec": round(hw_f / dt / 1e12, 2),
        **mem,
    }))


if __name__ == "__main__":
    main()
