"""Per-component timing of the flagship forward at b=16, 256^2.

Chained with scalar coupling (c *= 1 + eps*mean(out)) for honest timing on
the async tunneled backend.
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
L = 8

KW = dict(
    model_channels=96, num_res_blocks=2, attention_resolutions=(8, 16, 32),
    channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
    use_scale_shift_norm=True, deterministic=True, dtype=jnp.bfloat16,
)


def fetch(o):
    return float(np.asarray(jnp.sum(o.reshape(-1)[:1])))


def chain_time(apply_out, carry0):
    """apply_out: carry -> output array. Scalar-coupled chain."""

    @jax.jit
    def run(c0):
        def body(c, _):
            o = apply_out(c)
            return c * (1 + 1e-7 * jnp.mean(o).astype(c.dtype)), ()

        return jax.lax.scan(body, c0, None, length=L)[0]

    fetch(run(carry0))
    best = 1e9
    for r in range(2):
        ci = carry0 * (1 + (r + 1) * 1e-6)
        fetch(ci)
        t0 = time.perf_counter()
        fetch(run(ci))
        best = min(best, (time.perf_counter() - t0) / L)
    return best


def main():
    from dsdiff_tpu.models.backbone import (
        UNetDecoder, UNetEncoder, UNetMiddle,
    )
    from dsdiff_tpu.models import DSUNet

    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (B, 384), jnp.float32)
    x1 = jax.random.normal(rng, (B, H, H, 1), jnp.float32)

    # --- one encoder stream ---
    enc = UNetEncoder(**KW)
    ep = enc.init(jax.random.PRNGKey(1), x1[:1], emb[:1])
    dt1 = chain_time(lambda c: enc.apply(ep, c, emb)[0], x1)
    print(f"encoder x1      : {dt1*1e3:7.2f} ms", flush=True)

    # --- four sequential encoder streams (separate params) ---
    eps4 = [enc.init(jax.random.PRNGKey(10 + s), x1[:1], emb[:1])
            for s in range(4)]

    def enc4(c):
        outs = [enc.apply(p, c, emb)[0] for p in eps4]
        return jnp.stack(outs, 0)

    dt4 = chain_time(enc4, x1)
    print(f"encoder x4 seq  : {dt4*1e3:7.2f} ms", flush=True)

    # --- middle at bottleneck ---
    hb = jax.random.normal(rng, (B, 8, 8, 288), jnp.float32)
    mid = UNetMiddle(**KW)
    mp = mid.init(jax.random.PRNGKey(2), hb[:1], emb[:1])
    dtm = chain_time(lambda c: mid.apply(mp, c, emb), hb)
    print(f"middle          : {dtm*1e3:7.2f} ms", flush=True)

    # --- decoder with loop-invariant skips ---
    _, skips = enc.apply(eps4[0], x1, emb)
    dec = UNetDecoder(**KW)
    dp = dec.init(jax.random.PRNGKey(3), hb[:1],
                  [s[:1] for s in skips], emb[:1])
    dtd = chain_time(lambda c: dec.apply(dp, c, skips, emb), hb)
    print(f"decoder         : {dtd*1e3:7.2f} ms", flush=True)

    # --- attention ablation: full flagship w/ and w/o attention ---
    t = jnp.full((B,), 500.0)
    x4 = jax.random.normal(rng, (B, H, H, 4), jnp.float32)
    for attn in [(8, 16, 32), ()]:
        m = DSUNet(in_channels=4, out_channels=2, stream_mode="sequential",
                   **{**KW, "attention_resolutions": attn,
                      "use_scale_shift_norm": True},
                   )
        p = m.init(jax.random.PRNGKey(4), x4[:1], t[:1])
        dt = chain_time(lambda c, m=m, p=p: m.apply(p, c, t)[0], x4)
        print(f"full attn={str(attn):12s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
