"""Does the scan trip count change per-step cost on this backend?

Times the same data-dependent forward chain at several scan lengths and
unroll factors. If short scans are fully unrolled by XLA and run ~2.7x
faster per step, the bench should unroll its sampler loop.
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

H = 256
B = 16


def main():
    from dsdiff_tpu.models import DSUNet

    model = DSUNet(
        in_channels=4, model_channels=96, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, 4), jnp.float32)
    t = jnp.full((B,), 500.0)
    params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])

    def fwd(params, x, t):
        out, _ = model.apply(params, x, t)
        return out

    cases = [(10, 1), (50, 1), (50, 5), (50, 10), (50, 50)]
    for length, unroll in cases:
        @jax.jit
        def chain(params, x0, t, _len=length, _unr=unroll):
            def body(carry, _):
                o = fwd(params, carry, t)
                nxt = carry.at[..., :2].add(1e-6 * o.astype(carry.dtype))
                return nxt, ()

            return jax.lax.scan(body, x0, None, length=_len, unroll=_unr)[0]

        tc0 = time.perf_counter()
        out = chain(params, x, t)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - tc0
        t0 = time.perf_counter()
        out = chain(params, x + 1e-5, t)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / length
        print(f"length={length:3d} unroll={unroll:3d}  {dt*1e3:7.2f} ms/fwd"
              f"   (compile+first {compile_s:6.1f}s)", flush=True)


if __name__ == "__main__":
    main()
