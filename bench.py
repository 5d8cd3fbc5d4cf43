"""Headline benchmark: 256^2 DDIM-50 inference on the flagship DSUNet.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric = denoise steps/sec/chip (model forwards * batch per second on one
chip) for the flagship DSUnet at 256^2 with DDIM-50 — the BASELINE.json
headline. ``vs_baseline`` anchors to the reference's published sampler
latency: DDIM-100 at 256^2 ~= 9 s/sample on V100
(model_architecture_thesis.md:552-560), i.e. ~11.1 denoiser forwards/sec
single-stream.

The whole 50-step reverse chain is one jitted lax.scan (no host round-trips);
batch amortizes weight traffic over the MXU.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: makes repeat bench runs skip the (slow)
# first XLA compile when the backend supports executable serialization
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_FWD_PER_SEC = 100.0 / 9.0  # reference DDIM-100 ~9s/sample on V100

STEPS = 50
H = 256
COND_CH = 3


def build(batch):
    from dsdiff_tpu.core import schedules
    from dsdiff_tpu.models import DSUNet
    from dsdiff_tpu.train.step import TaskConfig, make_sample_fn

    model = DSUNet(
        in_channels=1 + COND_CH,
        model_channels=96,
        out_channels=2,  # learn_sigma
        num_res_blocks=2,
        attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3),
        num_head_channels=48,
        use_scale_shift_norm=True,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, H, H, 1 + COND_CH), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 1000)
    rsched = schedules.respace(
        betas, schedules.space_timesteps(1000, str(STEPS))
    )
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      learn_sigma=True)
    sample_fn = make_sample_fn(model.apply, rsched, task, "ddim")
    cond = jax.random.normal(
        jax.random.PRNGKey(1), (batch, H, H, COND_CH), jnp.float32
    )
    return params, sample_fn, cond


def run(batch, repeats=3):
    params, sample_fn, cond = build(batch)
    rng = jax.random.PRNGKey(2)
    # warmup/compile
    out = sample_fn(params, cond, rng)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(repeats):
        out = sample_fn(params, cond, jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / repeats
    flops = None
    try:
        ca = sample_fn.lower(params, cond, rng).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    return dt, flops


def run_cached(batch):
    """Condition-encoder-cached flagship variant (models/dsunet_cached.py):
    the three condition streams encode once per sample call. Reported as
    extra keys; the headline stays the reference-faithful path."""
    from dsdiff_tpu.core import sampling, schedules
    from dsdiff_tpu.models.dsunet_cached import (
        DSUNetSplit, make_cached_denoiser,
    )

    model = DSUNetSplit(
        model_channels=96, out_channels=2, num_res_blocks=2,
        attention_resolutions=(8, 16, 32), channel_mult=(1, 1, 2, 2, 3, 3),
        num_head_channels=48, use_scale_shift_norm=True, dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, H, H, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    betas = make_betas()
    rsched = respace_steps(betas)
    cond = jax.random.normal(jax.random.PRNGKey(1), (batch, H, H, 3))

    @jax.jit
    def sample(params, cond, rng):
        denoise = make_cached_denoiser(model, params, cond, t_ref=500.0)
        x_T = jax.random.normal(rng, (batch, H, H, 1), jnp.float32)
        return sampling.ddim_sample_loop(
            rsched, denoise, x_T, rng, parameterization="v",
            learn_sigma=True,
        )

    rng = jax.random.PRNGKey(2)
    out = sample(params, cond, rng)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = sample(params, cond, jax.random.fold_in(rng, i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3


def make_betas():
    from dsdiff_tpu.core import schedules

    return schedules.make_beta_schedule("linear", 1000)


def respace_steps(betas):
    from dsdiff_tpu.core import schedules

    return schedules.respace(
        betas, schedules.space_timesteps(1000, str(STEPS))
    )


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    candidates = [batch] if batch else [16, 8, 4, 2, 1]
    dt, used_batch, flops = None, None, None
    for b in candidates:
        try:
            dt, flops = run(b)
            used_batch = b
            break
        except Exception as e:  # OOM fallback to smaller batch
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                continue
            raise
    if dt is None:
        raise RuntimeError("all batch sizes failed")

    steps_per_sec = STEPS * used_batch / dt
    slices_per_sec = used_batch / dt
    extras = {}
    if flops:
        tflops = flops / dt / 1e12
        extras = {"achieved_tflops": round(tflops, 2),
                  "graph_gflops": round(flops / 1e9, 1)}
    try:
        dtc = run_cached(used_batch)
        extras["cached_cond_fwd_per_sec"] = round(
            STEPS * used_batch / dtc, 2)
        extras["cached_cond_slices_per_sec"] = round(used_batch / dtc, 3)
        extras["cached_cond_vs_baseline"] = round(
            STEPS * used_batch / dtc / BASELINE_FWD_PER_SEC, 2)
    except Exception:
        pass
    print(json.dumps({
        "metric": "dsunet_256_ddim50_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "model_fwd/s/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_FWD_PER_SEC, 2),
        "slices_per_sec": round(slices_per_sec, 3),
        "batch": used_batch,
        "sample_latency_s": round(dt, 3),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        **extras,
    }))


if __name__ == "__main__":
    main()
