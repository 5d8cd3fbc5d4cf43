"""Scan-length probe with ground-truth timing.

``block_until_ready`` proved unreliable on the tunneled TPU backend (calls
report ~0 ms). Here every timed call is forced to completion by fetching a
scalar computed from the output (device_get of out[0,0,0,0] — a tiny slice
execution that must wait for the real result, then a 4-byte transfer).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H = 256
B = 16


def fetch(out):
    """Force real completion: scalar device_get derived from the output."""
    return float(np.asarray(jnp.sum(out[:1, :1, :1, :1])))


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

    # single forward, honest
    jfwd = jax.jit(fwd)
    fetch(jfwd(params, x, t))
    for rep in range(3):
        xi = x + (rep + 1) * 1e-5
        fetch(xi)  # materialize input first
        t0 = time.perf_counter()
        fetch(jfwd(params, xi, t))
        print(f"single fwd rep{rep}: {(time.perf_counter()-t0)*1e3:8.2f} ms",
              flush=True)

    for length, unroll in [(10, 1), (50, 1), (50, 5)]:
        @jax.jit
        def chain(params, x0, t, _len=length, _unr=unroll):
            def body(carry, _):
                o = fwd(params, carry, t)
                nxt = carry.at[..., :2].add(1e-6 * o.astype(carry.dtype))
                return nxt, ()

            return jax.lax.scan(body, x0, None, length=_len, unroll=_unr)[0]

        tc0 = time.perf_counter()
        fetch(chain(params, x, t))
        compile_s = time.perf_counter() - tc0
        best = 1e9
        for rep in range(2):
            xi = x + (rep + 1) * 1e-5
            fetch(xi)
            t0 = time.perf_counter()
            fetch(chain(params, xi, t))
            best = min(best, time.perf_counter() - t0)
        print(f"length={length:3d} unroll={unroll:3d}  "
              f"{best/length*1e3:7.2f} ms/fwd  total {best:6.2f}s "
              f"(compile+first {compile_s:6.1f}s)", flush=True)


if __name__ == "__main__":
    main()
