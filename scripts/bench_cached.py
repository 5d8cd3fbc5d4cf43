"""Accelerated sampling bench: DSUNetSplit with condition-encoder caching.

Same flagship geometry as bench.py (256^2, DDIM-50, learn_sigma) but the
three condition encoder streams run ONCE per sample call instead of once per
step (arXiv:2312.09608-style encoder reuse — see models/dsunet_cached.py).
Prints one JSON line comparable to bench.py's headline.
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

from dsdiff_tpu.core import sampling, schedules
from dsdiff_tpu.models.dsunet_cached import DSUNetSplit, make_cached_denoiser

STEPS = 50
H = 256
BASELINE_FWD_PER_SEC = 100.0 / 9.0


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    model = DSUNetSplit(
        model_channels=96, out_channels=2, num_res_blocks=2,
        attention_resolutions=(8, 16, 32), channel_mult=(1, 1, 2, 2, 3, 3),
        num_head_channels=48, use_scale_shift_norm=True,
        dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, H, H, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 1000)
    rsched = schedules.respace(
        betas, schedules.space_timesteps(1000, str(STEPS))
    )
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
    dt = (time.perf_counter() - t0) / 3
    steps_per_sec = STEPS * batch / dt
    print(json.dumps({
        "metric": "dsunet_cachedcond_256_ddim50_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "model_fwd/s/chip",
        "vs_baseline": round(steps_per_sec / BASELINE_FWD_PER_SEC, 2),
        "slices_per_sec": round(batch / dt, 3),
        "batch": batch,
        "sample_latency_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
