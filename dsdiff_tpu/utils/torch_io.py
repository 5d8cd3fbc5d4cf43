"""Torch-checkpoint readers and torch->Flax key/layout mapping.

The reference loads pretrained torch checkpoints everywhere — HF
``vae-ft-mse-840000`` (ldm/models/autoencoder.py:111-120), SD2.1-unCLIP
(trainers/trainer_latent_diffusion.py:121-151), LPIPS nets
(loss_function/perceptual_loss.py:21), plus its own ``init_from_ckpt``
(ldm/models/diffusion/ddpm.py:210-270). This module makes those files
readable without importing torch:

- :func:`load_safetensors` — the safetensors format is an 8-byte little-
  endian header length, a JSON header ``{name: {dtype, shape, data_offsets}}``
  and a flat byte buffer; pure numpy.
- :func:`load_torch_pickle` — ``.pt/.pth/.ckpt`` zip archives hold
  ``data.pkl`` (a pickle whose tensors are persistent-id references) plus one
  raw little-endian storage file per tensor under ``data/``; a restricted
  unpickler rebuilds them as numpy arrays (strided views resolved with
  ``as_strided``), refusing any other global.
- :func:`load_checkpoint` — sniffs the format, unwraps ``state_dict``
  nesting, returns ``{dotted_name: np.ndarray}``.
- :func:`to_flax` / :func:`assign` — torch->Flax layout conversion
  (conv OIHW -> HWIO, linear transpose, norm weight -> scale) and pytree
  assignment routed through :mod:`dsdiff_tpu.train.surgery` for shape
  adaptation (make_it_fit parity).
- :func:`map_sd_vae` — CompVis/SD (and ``first_stage_model.``-prefixed full
  SD checkpoints) VAE key translation onto
  :class:`dsdiff_tpu.models.vae.AutoencoderKL`.
"""
from __future__ import annotations

import io
import json
import pickle
import re
import struct
import zipfile
from pathlib import Path

import numpy as np

__all__ = [
    "load_safetensors",
    "load_torch_pickle",
    "load_checkpoint",
    "to_flax",
    "assign",
    "map_sd_vae",
]

_SAFETENSORS_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16_dtype():
    import ml_dtypes

    return ml_dtypes.bfloat16


def load_safetensors(path) -> dict[str, np.ndarray]:
    """Read a .safetensors file with numpy only."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        buf = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt = meta["dtype"]
        dtype = _bf16_dtype() if dt == "BF16" else _SAFETENSORS_DTYPES[dt]
        lo, hi = meta["data_offsets"]
        arr = np.frombuffer(buf[lo:hi], dtype=dtype)
        out[name] = arr.reshape(meta["shape"])
    return out


_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    def __init__(self, array: np.ndarray):
        self.array = array


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    base = storage.array
    item = base.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        base[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * item for s in stride),
    ).copy()


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: only the globals a plain state_dict needs."""

    def __init__(self, file, read_storage):
        super().__init__(file)
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module == "torch" and name == "BFloat16Storage":
            return _bf16_dtype()
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *a: None
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module == "builtins" and name in ("dict", "set", "list"):
            import builtins

            return getattr(builtins, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle global {module}.{name}"
        )

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        assert pid[0] == "storage", f"unknown persistent id {pid!r}"
        _, storage_type, key, _location, numel = pid
        dtype = storage_type if isinstance(storage_type, type) or hasattr(
            storage_type, "itemsize"
        ) else np.float32
        return _StorageRef(self._read_storage(str(key), dtype, int(numel)))


def load_torch_pickle(path) -> dict[str, np.ndarray]:
    """Read a torch zip-format checkpoint (torch.save >= 1.6) with numpy."""
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]

    def read_storage(key, dtype, numel):
        raw = zf.read(f"{prefix}data/{key}")
        return np.frombuffer(raw, dtype=dtype, count=numel)

    with zf.open(pkl_name) as f:
        obj = _TorchUnpickler(io.BytesIO(f.read()), read_storage).load()
    return obj


def _as_dict(obj):
    return obj["state_dict"] if isinstance(obj, dict) and "state_dict" in obj \
        else obj


def load_checkpoint(path) -> dict[str, np.ndarray]:
    """Load any torch-ecosystem checkpoint file -> flat {name: ndarray}.

    Unwraps the Lightning/LDM ``state_dict`` nesting
    (ddpm.py:211-213) and converts bf16/f16 leaves to f32.
    """
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:4] == b"PK\x03\x04":
        obj = load_torch_pickle(path)
    else:
        try:
            obj = load_safetensors(path)
        except Exception as e:
            # legacy (pre-torch-1.6) tar/pickle format: fall back to torch
            # when it is importable (it is baked into this image)
            try:
                import torch

                def conv(v):
                    if hasattr(v, "detach"):
                        v = v.detach().cpu()
                        if v.dtype in (torch.float16, torch.bfloat16):
                            v = v.float()
                        return v.numpy()
                    return v

                obj = {
                    k: conv(v)
                    for k, v in _as_dict(
                        torch.load(path, map_location="cpu",
                                   weights_only=False)
                    ).items()
                }
            except ImportError:
                raise ValueError(
                    f"unrecognized checkpoint format: {path}"
                ) from e
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if not isinstance(v, np.ndarray):
            continue
        if v.dtype not in (np.float64, np.int64, np.int32, np.bool_):
            v = v.astype(np.float32)
        out[str(k)] = v
    return out


# ------------------------------------------------------------- layout mapping
def to_flax(name: str, value: np.ndarray):
    """Translate one torch parameter to Flax layout.

    Returns (leaf_name, array): conv weights OIHW->HWIO, linear weights
    transposed, norm/embedding ``weight`` -> ``scale``/``embedding`` handled
    by the caller's key map (here plain ``weight`` -> ``kernel``/``scale`` by
    rank).
    """
    if name.endswith(".weight"):
        if value.ndim == 4:  # conv
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear
            return "kernel", value.T
        if value.ndim == 1:  # norm
            return "scale", value
    if name.endswith(".bias"):
        return "bias", value
    return name.rsplit(".", 1)[-1], value


def _flatten(tree) -> dict:
    import jax

    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        flat[key] = leaf
    return flat


def assign(target_params, mapped: dict[str, np.ndarray],
           make_fit: bool = True, strict: bool = False):
    """Assign ``{flax_path: array}`` onto a param pytree.

    Shape mismatches go through surgery.fit_tensor (make_it_fit parity,
    ddpm.py:220-262) when ``make_fit``; unmatched target leaves keep their
    initialization (reported in the returned ``missing`` list).
    Returns (new_params, missing_keys, unused_source_keys).
    """
    import jax

    from ..train.surgery import fit_tensor

    t_flat = _flatten(target_params)
    out = {}
    missing = []
    used = set()
    for k, tv in t_flat.items():
        tv = np.asarray(tv)
        if k in mapped:
            sv = np.asarray(mapped[k])
            used.add(k)
            if sv.shape != tv.shape:
                if not make_fit:
                    raise ValueError(
                        f"shape mismatch at {k}: {sv.shape} vs {tv.shape}"
                    )
                sv = fit_tensor(sv, tv.shape)
            out[k] = sv.astype(tv.dtype)
        else:
            missing.append(k)
            out[k] = tv
    unused = sorted(set(mapped) - used)
    if strict and (missing or unused):
        raise ValueError(f"missing={missing[:8]} unused={unused[:8]}")
    # unflatten along the target treedef
    paths = jax.tree_util.tree_flatten_with_path(target_params)[0]
    treedef = jax.tree_util.tree_structure(target_params)
    leaves = []
    for p, _ in paths:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        leaves.append(out[key])
    return (
        jax.tree_util.tree_unflatten(treedef, leaves), missing, unused
    )


# ----------------------------------------------------------------- SD VAE map
def _vae_block(side: str, level: int, idx: int) -> str:
    return f"{side}_{level}_{idx}"


def map_sd_vae(state_dict: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """CompVis SD VAE state_dict -> flax paths of models.vae.AutoencoderKL.

    Accepts bare VAE checkpoints (``encoder.*`` / ``decoder.*`` /
    ``quant_conv.*``), full SD checkpoints (``first_stage_model.*`` prefix —
    autoencoder.py:111-120 strips it the same way), and Lightning ``model.``
    prefixes. 1x1 attention convs become Dense kernels.
    """
    sd = {}
    for k, v in state_dict.items():
        for pref in ("first_stage_model.", "model."):
            if k.startswith(pref):
                k = k[len(pref):]
        sd[k] = v

    mapped: dict[str, np.ndarray] = {}

    def put(flax_path: str, torch_key: str, norm: bool = False):
        if torch_key not in sd:
            return
        leaf, val = to_flax(torch_key, sd[torch_key])
        # GroupNorm32 wraps an inner nn.GroupNorm named 'norm'
        # (models/layers.py:85-100)
        sub = "/norm" if norm else ""
        mapped[f"params/{flax_path}{sub}/{leaf}"] = val

    def put_res(flax_prefix: str, torch_prefix: str):
        for part in ("norm1", "conv1", "norm2", "conv2", "nin_shortcut"):
            for suf in ("weight", "bias"):
                put(f"{flax_prefix}/{part}", f"{torch_prefix}.{part}.{suf}",
                    norm=part.startswith("norm"))

    def put_attn(flax_prefix: str, torch_prefix: str):
        for suf in ("weight", "bias"):
            put(f"{flax_prefix}/norm", f"{torch_prefix}.norm.{suf}",
                norm=True)
        for part in ("q", "k", "v", "proj_out"):
            w = sd.get(f"{torch_prefix}.{part}.weight")
            if w is not None:
                # 1x1 conv [O, I, 1, 1] -> Dense kernel [I, O]
                mapped[f"params/{flax_prefix}/{part}/kernel"] = (
                    w[:, :, 0, 0].T if w.ndim == 4 else w.T
                )
            b = sd.get(f"{torch_prefix}.{part}.bias")
            if b is not None:
                mapped[f"params/{flax_prefix}/{part}/bias"] = b

    # levels present in the checkpoint
    levels = sorted({
        int(m.group(1))
        for k in sd
        for m in [re.match(r"encoder\.down\.(\d+)\.", k)]
        if m
    })
    blocks = sorted({
        int(m.group(2))
        for k in sd
        for m in [re.match(r"encoder\.down\.(\d+)\.block\.(\d+)\.", k)]
        if m
    })
    for suf in ("weight", "bias"):
        put("encoder/conv_in", f"encoder.conv_in.{suf}")
        put("encoder/conv_out", f"encoder.conv_out.{suf}")
        put("encoder/norm_out", f"encoder.norm_out.{suf}", norm=True)
        put("decoder/conv_in", f"decoder.conv_in.{suf}")
        put("decoder/conv_out", f"decoder.conv_out.{suf}")
        put("decoder/norm_out", f"decoder.norm_out.{suf}", norm=True)
        put("quant_conv", f"quant_conv.{suf}")
        put("post_quant_conv", f"post_quant_conv.{suf}")
    for lv in levels:
        for b in blocks:
            put_res(f"encoder/{_vae_block('down', lv, b)}",
                    f"encoder.down.{lv}.block.{b}")
        for suf in ("weight", "bias"):
            put(f"encoder/down_{lv}_ds",
                f"encoder.down.{lv}.downsample.conv.{suf}")
    put_res("encoder/mid_res1", "encoder.mid.block_1")
    put_res("encoder/mid_res2", "encoder.mid.block_2")
    put_attn("encoder/mid_attn", "encoder.mid.attn_1")
    put_res("decoder/mid_res1", "decoder.mid.block_1")
    put_res("decoder/mid_res2", "decoder.mid.block_2")
    put_attn("decoder/mid_attn", "decoder.mid.attn_1")
    up_levels = sorted({
        int(m.group(1))
        for k in sd
        for m in [re.match(r"decoder\.up\.(\d+)\.", k)]
        if m
    })
    up_blocks = sorted({
        int(m.group(2))
        for k in sd
        for m in [re.match(r"decoder\.up\.(\d+)\.block\.(\d+)\.", k)]
        if m
    })
    for lv in up_levels:
        for b in up_blocks:
            put_res(f"decoder/{_vae_block('up', lv, b)}",
                    f"decoder.up.{lv}.block.{b}")
        for suf in ("weight", "bias"):
            put(f"decoder/up_{lv}_us",
                f"decoder.up.{lv}.upsample.conv.{suf}")
    return mapped


def load_sd_vae(path, target_params, make_fit: bool = True):
    """Read an SD/HF VAE checkpoint file and fit it onto AutoencoderKL params
    (the vae-ft-mse init capability, autoencoder.py:111-120 +
    trainer_latent_diffusion.py:136-151)."""
    sd = load_checkpoint(path)
    mapped = map_sd_vae(sd)
    params, missing, unused = assign(target_params, mapped, make_fit=make_fit)
    return params, missing, unused
