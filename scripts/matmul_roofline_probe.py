"""Decisive test for a Pallas conv: the 3x3@96ch conv at 256^2/b16 is an
implicit GEMM [B*H*W, 9*C] x [9*C, C]. If even the PURE matmul at that shape
can't beat XLA's conv rate (~67 TF/s), no conv kernel can, and the Pallas
conv idea dies on arithmetic. Also checks the N=96 output-padding penalty
by comparing N=96 vs N=128 and K=864 vs K=1024."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from dsdiff_tpu.utils.benchtime import chain_time  # noqa: E402


def main():
    M = 16 * 256 * 256  # 1,048,576
    for K, N in [(864, 96), (864, 128), (1024, 128), (96, 96), (288, 96)]:
        a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

        def mm(x):
            return (x @ b)[:, :K] if N >= K else x @ b  # keep shape for chain

        # chain via coupling back into A's first N columns
        def couple(x, y):
            return x.at[:, :min(K, N)].add(
                (1e-6 * y[:, :min(K, N)]).astype(x.dtype))

        dt = chain_time(lambda x: x @ b, a, couple=couple, length=8)
        fl = 2.0 * M * K * N
        print(f"M{M} K{K:5d} N{N:4d}: {dt*1e3:7.2f} ms  "
              f"{fl/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
