"""Is feature_group_count=4 conv (the vmapped 4-stream encoder's lowering)
slow on TPU vs equivalent-FLOP dense formulations?

Variants at the flagship encoder's hot shapes, all identical FLOPs:
  g4   : one grouped conv, x [B,H,W,4C], groups=4      (current lowering)
  d4b  : one dense conv, x [4B,H,W,C], shared weights  (streams in batch)
  seq4 : four dense convs, x [B,H,W,C] each            (reference style)
Chained x10 for honest timing (block_until_ready lies on this backend; a
scalar fetch forces completion).
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

B = 16
REPS = 10


def fetch(out):
    return float(np.asarray(jnp.sum(out[..., :1, :1, :1])))


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def chain(fn, x, n=REPS):
    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(c)
            return 0.9 * c + 0.1 * o, ()

        return jax.lax.scan(body, x, None, length=n)[0]

    fetch(run(x))  # compile
    best = 1e9
    for r in range(2):
        xi = x + (r + 1) * 1e-5
        fetch(xi)
        t0 = time.perf_counter()
        fetch(run(xi))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    key = jax.random.PRNGKey(0)
    for H, C in [(256, 96), (128, 96), (64, 192)]:
        gf = 2.0 * B * H * H * 4 * C * C * 9 / 1e9  # total FLOPs, all variants
        x_g = jax.random.normal(key, (B, H, H, 4 * C), jnp.bfloat16)
        w_g = jax.random.normal(key, (3, 3, C, 4 * C), jnp.bfloat16) * 0.02
        dt = chain(lambda x: conv(x, w_g, groups=4), x_g)
        print(f"H={H:3d} C={C:3d} g4  : {dt*1e3:7.2f} ms  "
              f"{gf/dt/1e3:6.1f} TF/s", flush=True)

        x_d = jax.random.normal(key, (4 * B, H, H, C), jnp.bfloat16)
        w_d = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02
        dt = chain(lambda x: conv(x, w_d), x_d)
        print(f"H={H:3d} C={C:3d} d4b : {dt*1e3:7.2f} ms  "
              f"{gf/dt/1e3:6.1f} TF/s", flush=True)

        x_s = jax.random.normal(key, (B, H, H, C), jnp.bfloat16)
        ws = [jax.random.normal(jax.random.fold_in(key, i),
                                (3, 3, C, C), jnp.bfloat16) * 0.02
              for i in range(4)]

        def seq4(x):
            return sum(conv(x, w) for w in ws) / 4.0

        dt = chain(seq4, x_s)
        print(f"H={H:3d} C={C:3d} seq4: {dt*1e3:7.2f} ms  "
              f"{gf/dt/1e3:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
