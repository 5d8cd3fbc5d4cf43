"""Checkpoint weight surgery: adapt mismatched parameter shapes.

Re-design of the reference's ``make_it_fit`` (ldm/models/diffusion/
ddpm.py:220-262): when loading pretrained weights whose channel counts
differ from the current model (e.g. SD 4-channel VAE weights into a
1-channel medical model, autoencoder.py:111-120), each mismatched tensor is
filled by cycling the source values along the mismatched axes so every
target element gets a (repeated) source element, averaged by use count.

Also provides ``init_from_ckpt``-style filtered loading with ignore-prefix
lists (ddpm.py:210-218).
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

__all__ = ["fit_tensor", "make_it_fit", "filtered_load",
           "convert_stream_layout"]


def fit_tensor(old: np.ndarray, new_shape: tuple) -> np.ndarray:
    """Cycle source values into a differently-shaped target.

    Rank>=2 with matching trailing dims reproduces the reference
    ``make_it_fit`` exactly (ddpm.py:235-260): modulo-cycle the first two
    axes, then divide by the reference's n_used count over the input axis
    (axis 1) — including its ones-initialized counter — so duplicated input
    channels don't inflate activations. Other shapes (rank change, trailing
    mismatch) fall back to generalized modulo-cycling, an extension the
    reference asserts away.
    """
    old = np.asarray(old)
    new_shape = tuple(new_shape)
    if old.shape == new_shape:
        return old.copy()
    if old.ndim != len(new_shape):
        # rank change: flatten-cycle
        flat = old.reshape(-1)
        out = np.take(flat, np.arange(int(np.prod(new_shape))) % flat.size)
        return out.reshape(new_shape).astype(old.dtype)
    if old.ndim >= 2 and old.shape[2:] == new_shape[2:]:
        i = np.arange(new_shape[0]) % old.shape[0]
        j = np.arange(new_shape[1]) % old.shape[1]
        new = old[np.ix_(i, j)].astype(np.float64)
        # ddpm.py:250-260 — n_used_old starts at ones, +1 per target use
        n_used_old = np.ones(old.shape[1])
        for jj in j:
            n_used_old[jj] += 1
        n_used_new = n_used_old[j].reshape(
            (1, new_shape[1]) + (1,) * (old.ndim - 2)
        )
        return (new / n_used_new).astype(old.dtype)
    idx = np.indices(new_shape)
    src = tuple(idx[d] % old.shape[d] for d in range(old.ndim))
    return old[src].astype(old.dtype)


def make_it_fit(loaded_params, target_params):
    """Shape-adapt a loaded param pytree onto the target's structure.

    Keys present in both trees are kept (shape-adapted when mismatched);
    target-only keys keep their fresh initialization; source-only keys are
    dropped. Trees are matched by flattened key-path strings so minor
    structural nesting differences survive.
    """
    t_flat = _flatten(target_params)
    l_flat = _flatten(loaded_params)
    out = {}
    for k, tv in t_flat.items():
        if k in l_flat:
            out[k] = fit_tensor(np.asarray(l_flat[k]), tv.shape).astype(
                np.asarray(tv).dtype
            )
        else:
            out[k] = np.asarray(tv)
    return _unflatten(out, target_params)


def filtered_load(loaded_params, target_params,
                  ignore_prefixes: Sequence[str] = ()):
    """init_from_ckpt parity (ddpm.py:210-218): drop ignored key prefixes,
    keep target init for anything missing or mismatched in shape."""
    t_flat = _flatten(target_params)
    l_flat = _flatten(loaded_params)
    out = {}
    for k, tv in t_flat.items():
        lv = l_flat.get(k)
        if (
            lv is None
            or any(k.startswith(p) for p in ignore_prefixes)
            or np.asarray(lv).shape != np.asarray(tv).shape
        ):
            out[k] = np.asarray(tv)
        else:
            out[k] = np.asarray(lv)
    return _unflatten(out, target_params)


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = leaf
    return flat


def _unflatten(flat: dict, template):
    paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, _ in paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _stacked_streams(node) -> int | None:
    """If every leaf under ``node`` shares the same leading dim in 2..8,
    return it (vmapped stream-axis layout), else None."""
    leaves = jax.tree_util.tree_leaves(node)
    if not leaves:
        return None
    dims = {
        (leaf.shape[0] if getattr(leaf, "ndim", 0) >= 1 else None)
        for leaf in leaves
    }
    if len(dims) == 1:
        (d,) = dims
        if d is not None and 2 <= d <= 8:
            return int(d)
    return None


def convert_stream_layout(tree):
    """Convert DSUNet/DiscUNet params between encoder layouts, both ways.

    stream_mode='vmapped' stores the per-stream encoders as ONE subtree
    ``encoders`` whose leaves carry a leading stream axis; 'sequential'
    (the default since the grouped-conv perf measurement) stores
    ``encoder_0..encoder_{n-1}`` subtrees with no stream axis. Checkpoints
    written under one mode silently fail to restore under the other; this
    walks any nested dict/list pytree and rewrites whichever layout it
    finds into the other (split the stream axis -> encoder_{i}, or stack
    encoder_{i} -> encoders).
    """
    if isinstance(tree, (list, tuple)):
        out = [convert_stream_layout(v) for v in tree]
        return type(tree)(out) if isinstance(tree, tuple) else out
    if not isinstance(tree, dict):
        return tree
    out = {}
    enc_keys = sorted(
        (k for k in tree if isinstance(k, str)
         and k.startswith("encoder_") and k[len("encoder_"):].isdigit()),
        key=lambda k: int(k.split("_")[-1]),
    )
    for k, v in tree.items():
        if k == "encoders":
            n = _stacked_streams(v)
            if n is not None:
                for i in range(n):
                    out[f"encoder_{i}"] = jax.tree_util.tree_map(
                        lambda leaf, i=i: leaf[i], convert_stream_layout(v)
                    )
                continue
        if k in enc_keys:
            continue  # handled below as a group
        out[k] = convert_stream_layout(v)
    if enc_keys:
        subs = [convert_stream_layout(tree[k]) for k in enc_keys]
        out["encoders"] = jax.tree_util.tree_map(
            lambda *leaves: np.stack([np.asarray(l) for l in leaves], 0),
            *subs,
        )
    return out
