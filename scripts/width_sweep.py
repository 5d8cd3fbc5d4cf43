"""Width-vs-MFU datapoint (VERDICT r2 item 6).

PROFILE.md §3 concluded the C=96 flagship forward is bound by XLA's
dense-conv rate with channel counts padded to the 128-wide MXU lanes; the
reference's own configs run C=320 (v2-1-cddpm-ds-disc.yaml:28) and C=160
(model_architecture_thesis.md:516). This sweep measures one DSUNet forward
at each width and reports achieved TFLOP/s + MFU so the lane-padding
prediction meets data at 128-multiple-adjacent widths.

Usage: python scripts/width_sweep.py [h=256]
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dsdiff_tpu.models import DSUNet

import mfu_probe

PEAK = 197e12  # v5e bf16


def run(width, head_ch, batch, h):
    model = DSUNet(
        in_channels=4, model_channels=width, out_channels=2,
        num_res_blocks=2, attention_resolutions=(8, 16, 32),
        channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=head_ch,
        use_scale_shift_norm=True, dtype=jnp.bfloat16,
    )
    x1 = jnp.zeros((1, h, h, 4), jnp.float32)
    t1 = jnp.zeros((1,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x1, t1)
    n_par = sum(p.size for p in jax.tree.leaves(params))

    @jax.jit
    def fwd(p, x, t):
        out, _ = model.apply(p, x, t)
        return out

    x = jax.random.normal(jax.random.PRNGKey(1), (batch, h, h, 4),
                          jnp.float32)
    t = jnp.full((batch,), 500.0)
    out = fwd(params, x, t)
    _ = np.asarray(out[0, 0, 0])  # device_get barrier (PROFILE.md §1)
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, x, t)
    _ = np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    flops = mfu_probe.dsunet_forward_flops(batch, model_channels=width, h=h)
    rec = {
        "model_channels": width,
        "params_m": round(n_par / 1e6, 1),
        "batch": batch,
        "h": h,
        "fwd_per_sec": round(batch / dt, 1),
        "gflops_fwd": round(flops / batch / 1e9, 1),
        "tflops_per_sec": round(flops / dt / 1e12, 2),
        "mfu_pct": round(100.0 * flops / dt / PEAK, 2),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = []
    for width, head_ch, batch in ((96, 48, 16), (128, 32, 16),
                                  (160, 32, 8), (320, 32, 4)):
        rows.append(run(width, head_ch, batch, h))
    print(json.dumps({"width_sweep": rows}, indent=2))


if __name__ == "__main__":
    main()
