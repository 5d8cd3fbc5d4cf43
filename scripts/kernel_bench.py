"""Microbenchmarks: Pallas kernels vs XLA fallbacks on the real chip.

Decides whether the Pallas flash-attention and fused-GN+SiLU kernels stay
enabled in the hot path (ops dispatcher) at the workload's shapes.

Timing uses data-dependent chains with device_get barriers
(`dsdiff_tpu.utils.benchtime`) — plain block_until_ready loop timing is
unreliable on the tunneled backend (PROFILE.md §1); the round-1 gates were
decided with the unreliable method and are re-validated here.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

from dsdiff_tpu.utils.benchtime import chain_time  # noqa: E402


def bench_attention():
    from dsdiff_tpu.ops import _xla_attention
    from dsdiff_tpu.ops.flash_attention import flash_attention

    # the workload's attention shapes: 256^2 model, attn at /8,/16 ->
    # N=1024/256 tokens, heads*48 head-dim, batch 16 (x4 streams at /8)
    print("== attention (pallas vs xla), bf16, honest chained timing ==",
          flush=True)
    for B, N, H, D in [(16, 1024, 4, 48), (64, 1024, 4, 48),
                       (64, 256, 6, 48), (16, 4096, 8, 64)]:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (B, N, H, D), jnp.bfloat16)

        def couple(x, y):
            return x + (1e-6 * y).astype(x.dtype)

        try:
            tp = chain_time(lambda x: flash_attention(x, q, q), q,
                            couple=couple)
        except Exception as e:
            print(f"B{B} N{N} H{H} D{D}: pallas FAILED {e}", flush=True)
            continue
        tx = chain_time(lambda x: _xla_attention(x, q, q), q, couple=couple)
        print(f"B{B} N{N} H{H} D{D}: pallas {tp*1e3:.3f}ms "
              f"xla {tx*1e3:.3f}ms speedup {tx/tp:.2f}x", flush=True)


def bench_gn_silu():
    from dsdiff_tpu.ops.fused_norm import group_norm_silu

    print("== groupnorm+silu (pallas vs xla), honest chained timing ==",
          flush=True)

    def xla_ref(x, s, b, groups):
        import flax.linen as nn

        gn = nn.GroupNorm(num_groups=groups, use_bias=False,
                          use_scale=False)
        y = gn.apply({}, x.astype(jnp.float32))
        return (nn.silu(y * s + b)).astype(x.dtype)

    for B, H, C in [(16, 256, 96), (16, 128, 96), (16, 64, 192),
                    (16, 32, 192), (16, 16, 288)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, H, C),
                              jnp.bfloat16)
        s = jnp.ones((C,))
        b = jnp.zeros((C,))
        groups = 32 if C % 32 == 0 else 24

        def couple(xc, y):
            return xc + (1e-6 * y).astype(xc.dtype)

        try:
            tp = chain_time(
                lambda xc: group_norm_silu(xc, s, b, groups),
                x, couple=couple)
        except Exception as e:
            print(f"B{B} {H}x{H}x{C}: pallas FAILED {type(e).__name__}",
                  flush=True)
            tp = None
        tx = chain_time(lambda xc: xla_ref(xc, s, b, groups), x,
                        couple=couple)
        if tp:
            print(f"B{B} {H}x{H}x{C}: pallas {tp*1e3:.3f}ms "
                  f"xla {tx*1e3:.3f}ms speedup {tx/tp:.2f}x", flush=True)
        else:
            print(f"B{B} {H}x{H}x{C}: xla {tx*1e3:.3f}ms", flush=True)


if __name__ == "__main__":
    bench_attention()
    bench_gn_silu()
