"""Experiment: pre-cast params to bf16 for the sampling loop.

RESULT (v5e, 256^2 DDIM-50 batch 16): bf16 params are ~5x SLOWER
(26 vs 141 fwd/s) — XLA's handling of f32 params + bf16 compute dtype is
already optimal (casts fused/hoisted), while all-bf16 parameter inputs push
some ops onto slower paths. Keep f32 master params.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

import bench


def main():
    batch = 16
    params, sample_fn, cond = bench.build(batch)
    bf16_params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        params,
    )
    rng = jax.random.PRNGKey(2)
    for name, ps in [("f32 params", params), ("bf16 params", bf16_params)]:
        out = sample_fn(ps, cond, rng)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(3):
            out = sample_fn(ps, cond, jax.random.fold_in(rng, i))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"{name}: {dt:.3f}s/sample-batch, "
              f"{50 * batch / dt:.1f} fwd/s")


if __name__ == "__main__":
    main()
