"""Microbenchmarks: Pallas kernels vs XLA fallbacks on the real chip.

Decides whether the Pallas flash-attention and fused-GN+SiLU kernels stay
enabled in the hot path (ops dispatcher) at the workload's shapes.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats, out


def bench_attention():
    from dsdiff_tpu.ops import _xla_attention
    from dsdiff_tpu.ops.flash_attention import flash_attention

    # the workload's attention shapes: 256^2 model, attn at /8,/16 ->
    # N=1024/256 tokens, heads*48 head-dim, batch 16 x 4 streams
    print("== attention (pallas vs xla), bf16 ==")
    for B, N, H, D in [(64, 1024, 4, 48), (64, 256, 6, 48),
                       (16, 1024, 8, 64), (16, 4096, 8, 64)]:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (B, N, H, D), jnp.bfloat16)
        tp, op = timeit(jax.jit(flash_attention), q, q, q)
        tx, ox = timeit(jax.jit(_xla_attention), q, q, q)
        err = float(jnp.max(jnp.abs(
            op.astype(jnp.float32) - ox.astype(jnp.float32))))
        print(f"B{B} N{N} H{H} D{D}: pallas {tp*1e3:.3f}ms "
              f"xla {tx*1e3:.3f}ms speedup {tx/tp:.2f}x maxerr {err:.4f}")


def bench_gn_silu():
    from dsdiff_tpu.ops import fused_group_norm_silu
    from dsdiff_tpu.ops.fused_norm import group_norm_silu

    print("== groupnorm+silu (pallas vs xla) ==")

    def xla_ref(x, s, b):
        import os

        os.environ["DSDIFF_FORCE_XLA_OPS"] = "1"
        try:
            return fused_group_norm_silu(x, s, b)
        finally:
            os.environ["DSDIFF_FORCE_XLA_OPS"] = "0"

    for B, H, C in [(16, 256, 96), (64, 128, 96), (16, 64, 192)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C),
                              jnp.bfloat16)
        s = jnp.ones((C,))
        b = jnp.zeros((C,))
        groups = 32 if C % 32 == 0 else 24
        tp, op = timeit(
            jax.jit(lambda x, s, b: group_norm_silu(x, s, b, groups)),
            x, s, b)
        tx, ox = timeit(jax.jit(lambda x, s, b: xla_ref(x, s, b)), x, s, b)
        err = float(jnp.max(jnp.abs(
            op.astype(jnp.float32) - ox.astype(jnp.float32))))
        print(f"B{B} {H}x{H}x{C}: pallas {tp*1e3:.3f}ms xla {tx*1e3:.3f}ms "
              f"speedup {tx/tp:.2f}x maxerr {err:.4f}")


if __name__ == "__main__":
    bench_attention()
    bench_gn_silu()
