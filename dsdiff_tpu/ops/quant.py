"""Int8 quantized inference path for conv-dominated sampling.

TPU v5e's MXU executes int8 x int8 -> int32 at ~2x its bf16 rate
(~394 TOPS vs ~197 TFLOPS), and flagship sampling is conv-MXU-bound
(PROFILE.md §3) — so running the denoiser's convolutions in int8 lifts
the sampling roofline. This module implements post-training dynamic
quantization:

* **weights**: symmetric per-output-channel int8, scales from the f32
  checkpoint params (computed inside jit; XLA's loop-invariant code
  motion hoists the rounding out of the sampling ``lax.scan``, so the
  per-step cost is zero);
* **activations**: symmetric per-tensor int8. Two modes: *dynamic*
  (max-abs scale computed per call — no calibration needed) or *static*
  (per-conv scales captured once by :func:`calibrate_act_scales` and
  baked into the graph as compile-time constants — the runtime max-abs
  reduction disappears entirely, PROFILE.md §10's stated flip condition);
* **accumulation**: int32, dequantized to f32 and cast back to the
  module dtype; bias added in f32.

It is wired in as a :func:`flax.linen.intercept_methods` interceptor that
swaps every eligible ``nn.Conv.__call__`` for the quantized execution
using the module's own params — zero model changes, works for every
backbone in ``models/``. Convs with fewer than ``min_channels`` input or
output channels (the 1-4 channel stems and the eps/v prediction head)
stay in the original dtype: they carry negligible FLOPs and outsized
quality sensitivity.

This is a TPU-native extension with no reference counterpart (the
reference's inference is fp32/fp16 torch, model_architecture_thesis.md
:563-569); quality deltas vs the bf16 path are tracked in PARITY.md.
"""
from __future__ import annotations

import contextlib
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "quantize_weight",
    "quantize_activation",
    "int8_conv",
    "int8_convs",
    "wrap_quantized",
    "calibrate_act_scales",
]

def quantize_weight(w: jax.Array, reduce_axes=(0, 1, 2)):
    """Symmetric per-output-channel int8 quantization of a conv kernel.

    ``w`` is HWIO; returns ``(w_i8, scale[cout])`` with
    ``w ≈ w_i8 * scale``.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_i8.astype(jnp.int8), scale


def quantize_activation(x: jax.Array, scale=None):
    """Symmetric per-tensor int8 quantization of an activation.

    With ``scale=None`` the scale is dynamic (max-abs over the tensor,
    computed in-graph); a static float ``scale`` (from
    :func:`calibrate_act_scales`) is baked in as a constant — no runtime
    reduction, and out-of-range values saturate at ±127.
    """
    if scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-8) / 127.0
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_i8.astype(jnp.int8), scale


def _norm_padding(padding, n_spatial: int):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * n_spatial
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def int8_conv(x, kernel, bias, *, strides, padding, feature_group_count=1,
              act_scale=None):
    """Quantized replacement for an NHWC ``nn.Conv`` application."""
    n_spatial = kernel.ndim - 2
    x_i8, sx = quantize_activation(x, scale=act_scale)
    w_i8, sw = quantize_weight(kernel, reduce_axes=tuple(range(kernel.ndim - 1)))
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape,
        ("NHWC", "HWIO", "NHWC") if n_spatial == 2
        else ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(
        x_i8, w_i8,
        window_strides=tuple(strides) if strides else (1,) * n_spatial,
        padding=_norm_padding(padding, n_spatial),
        dimension_numbers=dn,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _is_unit(dilation) -> bool:
    if dilation is None or dilation == 1:
        return True
    if isinstance(dilation, (tuple, list)):
        return all(int(v) == 1 for v in dilation)
    return False


def _eligible(mod: nn.Conv, x: jax.Array, min_channels: int) -> bool:
    if not _is_unit(mod.kernel_dilation) or not _is_unit(mod.input_dilation):
        return False
    if getattr(mod, "mask", None) is not None:
        return False
    if isinstance(mod.padding, str):
        if mod.padding not in ("SAME", "VALID"):
            return False  # CIRCULAR/CAUSAL: leave to flax
    elif not isinstance(mod.padding, (int, tuple, list)):
        return False  # callable padding: _norm_padding can't handle it
    cin = x.shape[-1]
    cout = mod.features
    return cin >= min_channels and cout >= min_channels


def _conv_key(mod: nn.Conv) -> str:
    return "/".join(mod.path)


def _make_interceptor(
    min_channels: int, act_scales: dict | None = None
) -> Callable[..., Any]:
    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (
            isinstance(mod, nn.Conv)
            and context.method_name == "__call__"
            and args
            and isinstance(args[0], jax.Array)
            and args[0].ndim in (4, 5)
            and _eligible(mod, args[0], min_channels)
        ):
            params = mod.variables["params"]
            kernel = params["kernel"]
            bias = params.get("bias") if mod.use_bias else None
            strides = mod.strides
            if isinstance(strides, int):
                strides = (strides,) * (args[0].ndim - 2)
            # static calibrated scale if available; dynamic otherwise (a
            # conv unseen during calibration degrades gracefully)
            scale = (act_scales or {}).get(_conv_key(mod))
            return int8_conv(
                args[0], kernel, bias,
                strides=strides, padding=mod.padding,
                feature_group_count=mod.feature_group_count,
                act_scale=scale,
            )
        return next_fn(*args, **kwargs)

    return interceptor


@contextlib.contextmanager
def int8_convs(min_channels: int = 32, act_scales: dict | None = None):
    """Context manager: every eligible ``nn.Conv`` applied (or traced)
    inside runs as an int8 MXU conv. Must be active while the function is
    *traced* (wrap the function body, not an already-jitted callable).
    ``act_scales`` ({module-path: float} from
    :func:`calibrate_act_scales`) switches matching convs from dynamic to
    static activation quantization."""
    with nn.intercept_methods(
        _make_interceptor(min_channels, act_scales)
    ):
        yield


def wrap_quantized(fn: Callable[..., Any], min_channels: int = 32,
                   act_scales: dict | None = None):
    """Return ``fn`` executed under :func:`int8_convs` — compose BEFORE
    ``jax.jit`` so interception happens at trace time."""

    def wrapped(*args, **kwargs):
        with int8_convs(min_channels=min_channels, act_scales=act_scales):
            return fn(*args, **kwargs)

    return wrapped


def calibrate_act_scales(fn: Callable[..., Any], inputs,
                         min_channels: int = 32) -> dict:
    """Static-calibration pass: run ``fn`` over ``inputs`` (an iterable of
    argument tuples — e.g. denoiser calls at representative (x_t, t)
    points) recording each eligible conv's activation max-abs; returns
    ``{module-path: float scale}`` for :func:`int8_convs`/
    :func:`wrap_quantized`.

    ``fn`` must be a SINGLE forward (the denoiser), not a scan-based
    sampling loop: recorded amax values are traced per call, and values
    from inside a ``lax.scan`` body cannot escape it. Covering the
    sampling trajectory = calibrating at several ``t`` values, which is
    exactly what passing multiple (x_t, t) inputs does.
    """
    def recording(*args):
        rec: dict = {}

        def recorder(next_fn, a, kw, context):
            mod = context.module
            if (
                isinstance(mod, nn.Conv)
                and context.method_name == "__call__"
                and a
                and isinstance(a[0], jax.Array)
                and a[0].ndim in (4, 5)
                and _eligible(mod, a[0], min_channels)
            ):
                amax = jnp.max(jnp.abs(a[0].astype(jnp.float32)))
                key = _conv_key(mod)
                rec[key] = (
                    jnp.maximum(rec[key], amax) if key in rec else amax
                )
            return next_fn(*a, **kw)

        with nn.intercept_methods(recorder):
            fn(*args)
        return rec

    # jit the recording wrapper (the rec dict is a pytree output), so one
    # calibration call costs one compiled forward, not an eager dispatch
    # per op — essential on the tunneled backend
    recording = jax.jit(recording)
    totals: dict[str, float] = {}
    for args in inputs:
        rec = jax.device_get(recording(*args))
        for key, amax in rec.items():
            totals[key] = max(totals.get(key, 0.0), float(amax))
    return {k: max(v, 1e-8) / 127.0 for k, v in totals.items()}
