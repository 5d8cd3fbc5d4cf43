"""End-to-end flagship forward: vmapped-grouped vs sequential-dense streams,
plus bf16 loop carry. Honest timing (scalar fetch per call)."""
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
L = 10


def fetch(out):
    return float(np.asarray(jnp.sum(out[..., :1, :1, :1])))


def time_chain(model, params, x, t):
    def fwd(params, x, t):
        out, _ = model.apply(params, x, t)
        return out

    @jax.jit
    def chain(params, x0, t):
        def body(c, _):
            o = fwd(params, c, t)
            return c.at[..., :2].add(1e-6 * o.astype(c.dtype)), ()

        return jax.lax.scan(body, x0, None, length=L)[0]

    fetch(chain(params, x, t))
    best = 1e9
    for r in range(2):
        xi = x + (r + 1) * 1e-5
        fetch(xi)
        t0 = time.perf_counter()
        fetch(chain(params, xi, t))
        best = min(best, (time.perf_counter() - t0) / L)
    return best


def main():
    from dsdiff_tpu.models import DSUNet

    common = dict(
        in_channels=4, model_channels=96, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
    )
    t = jnp.full((B,), 500.0)
    for mode in ["vmap", "sequential"]:
        model = DSUNet(stream_mode=mode, **common)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, 4),
                              jnp.float32)
        params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])
        dt = time_chain(model, params, x, t)
        print(f"{mode:10s} f32 carry : {dt*1e3:7.2f} ms/fwd", flush=True)
        xb = x.astype(jnp.bfloat16)
        dt = time_chain(model, params, xb, t)
        print(f"{mode:10s} bf16 carry: {dt*1e3:7.2f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
