"""Fold/unfold patched model application (LatentDiffusion split-input mode).

Re-design of reference ldm/models/diffusion/ddpm.py:690-927
(``get_fold_unfold`` + the ``split_input_params`` branch of ``apply_model``):
the input is cut into overlapping kernel_size/stride tiles, the denoiser runs
ONCE over all tiles folded into the batch axis (TPU-friendly: one big
batched call instead of a per-tile loop), and outputs are re-assembled with
the border-distance weighting and its fold-normalization.

Everything is static-shaped: tile offsets are Python ints at trace time, so
the whole thing compiles into one XLA program.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["delta_border", "get_weighting", "extract_patches",
           "fold_patches", "patched_apply"]


def delta_border(h: int, w: int) -> np.ndarray:
    """Normalized distance to the nearest image border, 0 at the border and
    0.5 at the center (reference ddpm.py:689-702)."""
    y = np.arange(h, dtype=np.float64) / max(h - 1, 1)
    x = np.arange(w, dtype=np.float64) / max(w - 1, 1)
    arr = np.stack(np.meshgrid(y, x, indexing="ij"), axis=-1)
    dist_lu = arr.min(axis=-1)
    dist_rd = (1.0 - arr).min(axis=-1)
    return np.minimum(dist_lu, dist_rd)


def get_weighting(
    kh: int, kw: int, Ly: int, Lx: int,
    clip_min_weight: float = 0.01, clip_max_weight: float = 0.5,
    tie_braker: bool = True,
    clip_min_tie_weight: float = 0.01, clip_max_tie_weight: float = 0.5,
) -> np.ndarray:
    """Per-pixel tile weighting [Ly*Lx, kh, kw] (reference ddpm.py:704-718)."""
    w = np.clip(delta_border(kh, kw), clip_min_weight, clip_max_weight)
    w = np.tile(w[None], (Ly * Lx, 1, 1))
    if tie_braker:
        lw = np.clip(delta_border(Ly, Lx), clip_min_tie_weight,
                     clip_max_tie_weight)
        w = w * lw.reshape(Ly * Lx, 1, 1)
    return w


def _offsets(size: int, k: int, s: int) -> list[int]:
    return list(range(0, size - k + 1, s))


def _check_coverage(size: int, k: int, s: int, axis: str) -> None:
    offs = _offsets(size, k, s)
    if not offs or offs[-1] + k != size:
        raise ValueError(
            f"kernel/stride do not tile the {axis} extent: size={size}, "
            f"kernel={k}, stride={s} leaves pixels "
            f"[{(offs[-1] + k) if offs else 0}, {size}) uncovered, which "
            f"would divide by a zero fold-norm (NaN output). Require "
            f"(size - kernel) % stride == 0."
        )


def extract_patches(x: jnp.ndarray, kernel_size, stride) -> jnp.ndarray:
    """[B, H, W, C] -> [B, L, kh, kw, C] overlapping tiles (torch Unfold
    semantics: L = Ly*Lx, y-major)."""
    kh, kw = kernel_size
    sh, sw = stride
    tiles = [
        x[:, oy : oy + kh, ox : ox + kw, :]
        for oy in _offsets(x.shape[1], kh, sh)
        for ox in _offsets(x.shape[2], kw, sw)
    ]
    return jnp.stack(tiles, axis=1)


def fold_patches(
    patches: jnp.ndarray, out_hw, kernel_size, stride,
    weighting: np.ndarray,
) -> jnp.ndarray:
    """[B, L, kh, kw, C] -> [B, H, W, C], overlap-summed with ``weighting``
    and divided by the folded weighting (reference normalization)."""
    kh, kw = kernel_size
    sh, sw = stride
    H, W = out_hw
    _check_coverage(H, kh, sh, "H")
    _check_coverage(W, kw, sw, "W")
    B, L, _, _, C = patches.shape
    w = jnp.asarray(weighting, patches.dtype)  # [L, kh, kw]
    canvas = jnp.zeros((B, H, W, C), patches.dtype)
    norm = jnp.zeros((1, H, W, 1), patches.dtype)
    i = 0
    for oy in _offsets(H, kh, sh):
        for ox in _offsets(W, kw, sw):
            canvas = canvas.at[:, oy : oy + kh, ox : ox + kw, :].add(
                patches[:, i] * w[i][None, :, :, None]
            )
            norm = norm.at[:, oy : oy + kh, ox : ox + kw, :].add(
                w[i][None, :, :, None]
            )
            i += 1
    return canvas / norm


def patched_apply(
    fn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    kernel_size,
    stride,
    cond: jnp.ndarray | None = None,
    **weight_params,
) -> jnp.ndarray:
    """Apply ``fn(x_tiles, t_tiles)`` over overlapping tiles and refold.

    ``fn`` maps [N, kh, kw, Cin] -> [N, kh, kw, Cout]. ``cond`` (channel
    conditioning) is tiled jointly with x and concatenated per tile —
    reference apply_model unfolds the already-concatenated input
    (ddpm.py:857-927). One batched model call covers all tiles.
    """
    kh, kw = kernel_size
    Ly = len(_offsets(x.shape[1], kh, stride[0]))
    Lx = len(_offsets(x.shape[2], kw, stride[1]))
    tiles = extract_patches(x, kernel_size, stride)  # [B, L, kh, kw, C]
    if cond is not None:
        ctiles = extract_patches(cond, kernel_size, stride)
        tiles = jnp.concatenate([tiles, ctiles], axis=-1)
    B, L = tiles.shape[:2]
    flat = tiles.reshape(B * L, kh, kw, tiles.shape[-1])
    t_rep = jnp.repeat(t, L, axis=0)
    out = fn(flat, t_rep)
    out = out.reshape(B, L, kh, kw, out.shape[-1])
    weighting = get_weighting(kh, kw, Ly, Lx, **weight_params)
    return fold_patches(out, x.shape[1:3], kernel_size, stride, weighting)
