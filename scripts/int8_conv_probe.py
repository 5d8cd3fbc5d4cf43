"""Probe: does an int8 conv reach the TPU's int8 MXU rate via XLA?

TPU v5e peaks at ~197 bf16 TFLOP/s and ~394 int8 TOP/s. PROFILE.md §3
shows flagship sampling is bound by XLA's dense-conv rate (~67 TF/s at
C=96). If `lax.conv_general_dilated` on int8 operands with an int32
accumulator lowers onto the int8 MXU path at ~2x the bf16 rate, a
quantized inference path (ops/quant.py) lifts the sampling roofline.

Timing: ops are chained inside ONE jit via lax.scan and the result fetched
once — separate dispatches over the axon tunnel are latency-dominated
(~100 ms round trip) and useless for microbenchmarks.

Run on the real chip: python scripts/int8_conv_probe.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = ("NHWC", "HWIO", "NHWC")
REPS = 30


def fetch(out):
    return float(np.asarray(jnp.sum(out[..., :1, :1, :1])))


def conv(x, w, out_dtype):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=DN, preferred_element_type=out_dtype)


def chain(body_fn, x0, n=REPS):
    @jax.jit
    def run(x):
        return lax.scan(lambda c, _: (body_fn(c), ()), x, None,
                        length=n)[0]

    fetch(run(x0))  # compile
    best = 1e9
    for r in range(2):
        xi = x0 + (r + 1)  # perturb so the tunnel can't serve a cached run
        fetch(xi)
        t0 = time.perf_counter()
        fetch(run(xi))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    shapes = [
        # (batch, hw, cin==cout) — flagship-dominant conv shapes at 256^2
        (16, 256, 96),
        (16, 128, 96),
        (16, 64, 192),
        (16, 32, 288),
        (16, 128, 128),   # the C=128 recommended operating point
        (16, 64, 256),
    ]
    key = jax.random.PRNGKey(0)
    for b, hw, c in shapes:
        flops = 2.0 * b * hw * hw * c * c * 9
        kx = jax.random.normal(key, (b, hw, hw, c))
        kw = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.05
        row = {"b": b, "hw": hw, "c": c, "gflop": round(flops / 1e9, 1)}

        wb = kw.astype(jnp.bfloat16)
        dt = chain(lambda x: conv(x, wb, jnp.bfloat16).astype(jnp.bfloat16),
                   kx.astype(jnp.bfloat16))
        row["bf16_tflops"] = round(flops / dt / 1e12, 1)

        wi = jnp.clip(jnp.round(kw / 0.001), -127, 127).astype(jnp.int8)

        def int8_body(ci):
            y = conv(ci, wi, jnp.int32)
            # cheap renorm back to int8 so the carry stays int8
            return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

        dt = chain(int8_body, jnp.clip(jnp.round(kx * 20), -127, 127)
                   .astype(jnp.int8))
        row["int8_tops"] = round(flops / dt / 1e12, 1)

        # full quantized op: dynamic per-tensor act quant + int8 conv +
        # dequant — what ops/quant.py would actually execute per layer
        def quant_body(cb):
            xs = jnp.max(jnp.abs(cb)) / 127.0
            x_i8 = jnp.clip(jnp.round(cb / xs), -127, 127).astype(jnp.int8)
            y = conv(x_i8, wi, jnp.int32)
            return (y.astype(jnp.float32) * (xs * 0.001)).astype(jnp.bfloat16)

        dt = chain(quant_body, kx.astype(jnp.bfloat16))
        row["quantop_tflops"] = round(flops / dt / 1e12, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
