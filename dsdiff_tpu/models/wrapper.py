"""Conditioning-mode dispatch + model registry.

``conditioned_call`` replaces the reference's DiffusionWrapper
(ldm/models/diffusion/ddpm.py:1319-1365): given a conditioning mode and a
cond dict with ``c_concat`` / ``c_crossattn`` / ``c_adm`` entries (lists of
arrays or arrays), it assembles the denoiser call. Being a pure function it
composes with jit/scan without module state.

``MODEL_REGISTRY``/``build_model`` replace the YAML ``target:`` reflection
loader (ldm/util.py:82-97) with an explicit registry — config files name a
registered key instead of a dotted import path (no arbitrary-code-execution
config surface).
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from .disc_unet import DiscUNet
from .dit import DIT_CONFIGS, DiT, make_dit
from .dsunet import DSUNet
from .dsunet_cached import DSUNetSplit
from .unet import UNet
from .vae import AutoencoderKL

__all__ = ["conditioned_call", "MODEL_REGISTRY", "build_model"]

CONDITIONING_MODES = (
    "none", "concat", "crossattn", "hybrid", "adm", "hybrid-adm",
    "crossattn-adm",
)


def _as_list(v) -> list:
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return list(v)
    return [v]


def conditioned_call(
    apply_fn: Callable,
    mode: str,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: dict | None = None,
    **kw,
):
    """Dispatch a denoiser call per conditioning mode (ddpm.py:1326-1361)."""
    cond = cond or {}
    c_concat = _as_list(cond.get("c_concat"))
    c_crossattn = _as_list(cond.get("c_crossattn"))
    c_adm = cond.get("c_adm")

    if mode in ("none", None):
        return apply_fn(x, t, **kw)
    if mode == "concat":
        xc = jnp.concatenate([x] + c_concat, axis=-1)
        return apply_fn(xc, t, **kw)
    if mode == "crossattn":
        ctx = jnp.concatenate(c_crossattn, axis=1)
        return apply_fn(x, t, ctx, **kw)
    if mode == "hybrid":
        xc = jnp.concatenate([x] + c_concat, axis=-1)
        ctx = jnp.concatenate(c_crossattn, axis=1)
        return apply_fn(xc, t, ctx, **kw)
    if mode == "adm":
        return apply_fn(x, t, y=c_adm, **kw)
    if mode == "hybrid-adm":
        xc = jnp.concatenate([x] + c_concat, axis=-1)
        return apply_fn(xc, t, y=c_adm, **kw)
    if mode == "crossattn-adm":
        ctx = jnp.concatenate(c_crossattn, axis=1)
        return apply_fn(x, t, ctx, y=c_adm, **kw)
    raise ValueError(f"unknown conditioning mode '{mode}'")


def _medseg(mode):
    def make(**kw):
        from .seg_unet import MedSegDiffUNet

        kw.pop("in_channels", None)
        return MedSegDiffUNet(mode=mode, **kw)

    return make


MODEL_REGISTRY: dict[str, Callable[..., Any]] = {
    "unet": UNet,
    "dsunet": DSUNet,
    "dsunet_split": DSUNetSplit,
    "disc_unet": DiscUNet,
    "dit": DiT,
    "autoencoder_kl": AutoencoderKL,
    "medseg_v1": _medseg("highway"),
    "medseg_new": _medseg("anchor"),
    **{name.lower(): (lambda n: (lambda **kw: make_dit(n, **kw)))(name)
       for name in DIT_CONFIGS},
}


def build_model(name: str, **params):
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model '{name}' (have {sorted(MODEL_REGISTRY)})"
        )
    return MODEL_REGISTRY[key](**params)
