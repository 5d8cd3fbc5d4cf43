"""MFU probe: where does the flagship DSUNet forward actually spend time?

Measures a SINGLE denoiser forward (not the 50-step chain) on the live
backend at several batch sizes, against analytically-counted FLOPs (XLA's
``cost_analysis()`` undercounts convolutions on TPU, so we count matmul/conv
MACs ourselves from the module tree), and optionally dumps a profiler trace.

Usage:
  python scripts/mfu_probe.py [--batch 16] [--trace /tmp/tb] [--variant X]

Variants: flagship (4-stream vmapped), singlestream (one UNetEncoder),
grouped (streams folded to channels).
"""
import argparse
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


def conv_flops(h, w, cin, cout, k=3, groups=1):
    """MACs*2 for one conv at spatial h*w."""
    return 2.0 * h * w * (cin // groups) * cout * k * k


def dsunet_forward_flops(batch, model_channels=96,
                         channel_mult=(1, 1, 2, 2, 3, 3), num_res_blocks=2,
                         attn_res=(8, 16, 32), h=H):
    """Analytic FLOPs for one flagship DSUNet forward (batch included).

    Counts 3x3/1x1 convs of encoder(x4 streams) + middle + disentangle heads
    + decoder + attention matmuls. GroupNorm/SiLU/elementwise ignored (<2%).
    """
    ch0 = model_channels
    total = 0.0
    # --- one encoder stream ---
    enc = 0.0
    res = h
    enc += conv_flops(res, res, 1, ch0)  # stem
    ch = ch0
    skip_chs = [(ch, res)]
    for lvl, mult in enumerate(channel_mult):
        out_ch = ch0 * mult
        for _ in range(num_res_blocks):
            enc += conv_flops(res, res, ch, out_ch)       # res conv1
            enc += conv_flops(res, res, out_ch, out_ch)   # res conv2
            enc += 2 * ch * out_ch * 4 * 2  # emb linear (tiny)
            if ch != out_ch:
                enc += conv_flops(res, res, ch, out_ch, k=1)
            ch = out_ch
            if (h // res) in attn_res:
                n = res * res
                enc += 2 * n * ch * 3 * ch + 2 * n * n * ch * 2 \
                    + 2 * n * ch * ch  # qkv + scores/values + proj
            skip_chs.append((ch, res))
        if lvl != len(channel_mult) - 1:
            enc += conv_flops(res // 2, res // 2, ch, ch)  # downsample conv
            res //= 2
            skip_chs.append((ch, res))
    total += 4 * enc  # 4 streams
    # --- middle ---
    mid = 2 * (conv_flops(res, res, ch, ch) * 2)
    n = res * res
    mid += 2 * n * ch * 3 * ch + 2 * n * n * ch * 2 + 2 * n * ch * ch
    total += mid
    # --- disentangle heads: 4 convs of [4B or 2B] at bottleneck ---
    heads = (4 + 4 + 2 + 2) * (conv_flops(res, res, ch, ch)
                               + conv_flops(res, res, ch, ch // 2, k=1))
    total += heads
    # SE projections: 4x 3x3 conv at half channels
    total += 4 * conv_flops(res, res, ch // 2, ch // 2)
    # all_proj: 1x1 over concat 3*ch
    total += conv_flops(res, res, ch + 2 * ch, ch, k=1)
    # --- decoder (mirrors encoder + skip concat convs) ---
    dec = 0.0
    for lvl, mult in reversed(list(enumerate(channel_mult))):
        out_ch = ch0 * mult
        for _ in range(num_res_blocks + 1):
            skip_ch, _r = skip_chs.pop()
            dec += conv_flops(res, res, ch + skip_ch, out_ch)
            dec += conv_flops(res, res, out_ch, out_ch)
            if ch + skip_ch != out_ch:
                dec += conv_flops(res, res, ch + skip_ch, out_ch, k=1)
            ch = out_ch
            if (h // res) in attn_res:
                n = res * res
                dec += 2 * n * ch * 3 * ch + 2 * n * n * ch * 2 \
                    + 2 * n * ch * ch
        if lvl != 0:
            res *= 2
            dec += conv_flops(res, res, ch, ch)  # upsample conv
    total += dec
    total += conv_flops(h, h, ch0, 2)  # out head
    return total * batch


def build(variant="flagship", dtype=jnp.bfloat16):
    from dsdiff_tpu.models import DSUNet
    from dsdiff_tpu.models.backbone import UNetEncoder

    if variant == "flagship":
        model = DSUNet(
            in_channels=4, model_channels=96, out_channels=2,
            num_res_blocks=2, attention_resolutions=(8, 16, 32),
            channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
            use_scale_shift_norm=True, dtype=dtype,
        )

        def fwd(params, x, t):
            out, _ = model.apply(params, x, t)
            return out

        cin = 4
    elif variant == "singlestream":
        model = UNetEncoder(
            model_channels=96, num_res_blocks=2,
            attention_resolutions=(8, 16, 32),
            channel_mult=(1, 1, 2, 2, 3, 3), num_head_channels=48,
            use_scale_shift_norm=True, dtype=dtype, deterministic=True,
        )

        def fwd(params, x, t):
            from dsdiff_tpu.models.layers import TimeEmbed  # noqa
            h, _ = model.apply(params, x, jnp.zeros((x.shape[0], 384)))
            return h

        cin = 1
    else:
        raise ValueError(variant)
    return model, fwd, cin


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="4,8,16,32")
    ap.add_argument("--variant", type=str, default="flagship")
    ap.add_argument("--trace", type=str, default="")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model, fwd, cin = build(args.variant, dtype)
    jfwd = jax.jit(fwd)
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}")

    for b in [int(x) for x in args.batches.split(",")]:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, H, H, cin),
                              jnp.float32)
        t = jnp.full((b,), 500.0)
        if args.variant == "flagship":
            params = model.init(jax.random.PRNGKey(1), x[:1], t[:1])
            arg = (params, x, t)
        else:
            params = model.init(jax.random.PRNGKey(1), x[:1],
                                jnp.zeros((1, 384)))
            arg = (params, x, t)
        out = jfwd(*arg)
        jax.block_until_ready(out)
        # independent dispatches overlap on the tunneled device (and
        # identical ones may be cached), so time a data-dependent scan
        # chain — each forward consumes the previous output, exactly like
        # the sampler loop the bench measures
        reps = 10

        @jax.jit
        def chain(params, x0, t):
            import jax.lax as lax

            def body(carry, _):
                o = fwd(params, carry, t)
                nxt = carry.at[..., : o.shape[-1]].add(
                    1e-6 * o.astype(carry.dtype)
                )
                return nxt, ()

            return lax.scan(body, x0, None, length=reps)[0]

        outc = chain(arg[0], x, *arg[2:])
        jax.block_until_ready(outc)
        t0 = time.perf_counter()
        outc = chain(arg[0], x + 1e-5, *arg[2:])
        jax.block_until_ready(outc)
        dt = (time.perf_counter() - t0) / reps
        fl = dsunet_forward_flops(b)
        if args.variant == "singlestream":
            fl = fl / 4  # rough: one stream's encoder ~ 1/4 of 4-stream enc
        print(f"batch={b:3d}  {dt*1e3:8.2f} ms/fwd  "
              f"analytic={fl/1e9:8.1f} GFLOP  "
              f"achieved={fl/dt/1e12:6.2f} TFLOP/s")
        if args.trace and b == 16:
            with jax.profiler.trace(args.trace):
                for _ in range(3):
                    out = jfwd(*arg)
                jax.block_until_ready(out)
            print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
