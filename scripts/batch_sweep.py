"""Throughput vs batch for the flagship forward (sequential stream mode),
honest chained timing. Finds the knee before the HBM cliff."""
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
L = 8


def fetch(o):
    return float(np.asarray(jnp.sum(o.reshape(-1)[:1])))


def main():
    from dsdiff_tpu.models import DSUNet

    model = DSUNet(
        in_channels=4, model_channels=96, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
        use_scale_shift_norm=True, stream_mode="sequential",
        dtype=jnp.bfloat16,
    )
    batches = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1
                                else ["8", "16", "24", "32"])]
    for B in batches:
        t = jnp.full((B,), 500.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, 4),
                              jnp.float32)
        params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])

        @jax.jit
        def chain(params, x0, t):
            def body(c, _):
                o, _f = model.apply(params, c, t)
                return c.at[..., :2].add(1e-6 * o.astype(c.dtype)), ()

            return jax.lax.scan(body, x0, None, length=L)[0]

        try:
            fetch(chain(params, x, t))
            best = 1e9
            for r in range(2):
                xi = x + (r + 1) * 1e-5
                fetch(xi)
                t0 = time.perf_counter()
                fetch(chain(params, xi, t))
                best = min(best, (time.perf_counter() - t0) / L)
            print(f"B={B:3d}: {best*1e3:7.2f} ms/fwd  "
                  f"{B/best:7.1f} samples/s-fwd", flush=True)
        except Exception as e:
            print(f"B={B:3d}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
