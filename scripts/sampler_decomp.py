"""Decompose the DDIM-50 bench latency: which layer adds the overhead?

Times, at the bench's exact flagship config / batch:
  A. make_sample_fn (the bench path)
  B. ddim_sample_loop called directly on a raw denoiser closure
  C. bare scan: forward + 2 fused multiply-adds (sampler-free floor)
Each timed as one jitted call, 3 reps, varied rng per rep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = 50
H = 256
B = 16


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args[:-1], jax.random.fold_in(args[-1], i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from dsdiff_tpu.core import sampling, schedules
    from dsdiff_tpu.models import DSUNet
    from dsdiff_tpu.train.step import TaskConfig, make_sample_fn

    model = DSUNet(
        in_channels=4, model_channels=96, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, H, H, 4), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))
    betas = schedules.make_beta_schedule("linear", 1000)
    rsched = schedules.respace(betas, schedules.space_timesteps(1000, str(STEPS)))
    task = TaskConfig(parameterization="v", loss_type="charbonnier",
                      learn_sigma=True)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, H, 3), jnp.float32)
    rng = jax.random.PRNGKey(2)

    # --- A: bench path ---
    sample_fn = make_sample_fn(model.apply, rsched, task, "ddim")
    dt = timeit(sample_fn, params, cond, rng)
    print(f"A make_sample_fn       : {dt:7.3f} s  ({dt/STEPS*1e3:6.1f} ms/step)")

    # --- B: ddim_sample_loop direct ---
    @jax.jit
    def direct(params, cond, rng):
        x_rng, _ = jax.random.split(rng)
        x_T = jax.random.normal(x_rng, (B, H, H, 1), jnp.float32)

        def denoise(x, t_model):
            xin = jnp.concatenate([x, cond], axis=-1)
            out, _ = model.apply(params, xin, t_model)
            return out

        return sampling.ddim_sample_loop(
            rsched, denoise, x_T, rng, parameterization="v",
            learn_sigma=True, clip_denoised=True,
        )

    dt = timeit(direct, params, cond, rng)
    print(f"B ddim_sample_loop     : {dt:7.3f} s  ({dt/STEPS*1e3:6.1f} ms/step)")

    # --- B2: like B but clip_denoised=False ---
    @jax.jit
    def directnc(params, cond, rng):
        x_rng, _ = jax.random.split(rng)
        x_T = jax.random.normal(x_rng, (B, H, H, 1), jnp.float32)

        def denoise(x, t_model):
            xin = jnp.concatenate([x, cond], axis=-1)
            out, _ = model.apply(params, xin, t_model)
            return out

        return sampling.ddim_sample_loop(
            rsched, denoise, x_T, rng, parameterization="v",
            learn_sigma=True, clip_denoised=False,
        )

    dt = timeit(directnc, params, cond, rng)
    print(f"B2 no clip             : {dt:7.3f} s  ({dt/STEPS*1e3:6.1f} ms/step)")

    # --- C: bare scan floor ---
    @jax.jit
    def bare(params, cond, rng):
        x_T = jax.random.normal(rng, (B, H, H, 1), jnp.float32)

        def body(x, i):
            xin = jnp.concatenate([x, cond], axis=-1)
            out, _ = model.apply(params, xin, jnp.full((B,), 500.0))
            x = 0.99 * x - 0.1 * out[..., :1]
            return x, ()

        return jax.lax.scan(body, x_T, jnp.arange(STEPS))[0]

    dt = timeit(bare, params, cond, rng)
    print(f"C bare scan floor      : {dt:7.3f} s  ({dt/STEPS*1e3:6.1f} ms/step)")


if __name__ == "__main__":
    main()
