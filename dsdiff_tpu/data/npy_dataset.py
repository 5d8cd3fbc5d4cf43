"""Memory-mapped npy volume datasets (DisC-Diff data plane).

Re-design of Disc_diff/guided_diffusion/image_datasets.py:

- :class:`NpyVolumeDataset`: stacked [N, H, W] npy arrays per sequence,
  memory-mapped (BraTSMRI :59-92, incl. the central-slice window option —
  the reference keeps slices 40:60 of each volume),
- returns the same {'image', 'target'} rows as
  :class:`~dsdiff_tpu.data.pipeline.SliceDataset` so loaders/curriculum
  compose unchanged (ProstateMRI_with_shannon_entropy pairs with
  data.curriculum.EntropyCurriculum).
- :func:`build_volume_cache` == the whole-dataset cache builder
  (training_project/utils/create_whole_dataset.py): H5 slice store ->
  stacked npy per sequence.
"""
from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from . import h5store
from .transforms import divisible_pad, random_flip, random_rotate

__all__ = ["NpyVolumeDataset", "build_volume_cache"]


class NpyVolumeDataset:
    def __init__(
        self,
        npy_paths: dict,
        gt_key: str,
        slice_range: tuple | None = None,
        augment: bool = False,
        aug_prob: float = 0.5,
        pad_to: int = 32,
    ):
        self.arrays = {k: np.load(p, mmap_mode="r")
                       for k, p in npy_paths.items()}
        shapes = {a.shape for a in self.arrays.values()}
        assert len(shapes) == 1, f"misaligned npy stacks: {shapes}"
        self.gt_key = gt_key
        self.cond_keys = [k for k in self.arrays if k != gt_key]
        n = next(iter(shapes))[0]
        if slice_range is not None:
            lo, hi = slice_range
            self.index = list(range(lo, min(hi, n)))
        else:
            self.index = list(range(n))
        self.augment = augment
        self.aug_prob = aug_prob
        self.pad_to = pad_to

    def __len__(self):
        return len(self.index)

    def get(self, i: int, rng: np.random.Generator) -> dict:
        s = self.index[i]
        cond = np.stack([
            divisible_pad(np.asarray(self.arrays[k][s], np.float32),
                          self.pad_to)
            for k in self.cond_keys
        ])
        target = divisible_pad(
            np.asarray(self.arrays[self.gt_key][s], np.float32), self.pad_to
        )[None]
        if self.augment:
            cond, target = random_rotate([cond, target], rng,
                                         prob=self.aug_prob)
            cond, target = random_flip([cond, target], rng,
                                       prob=self.aug_prob)
        return {
            "image": cond.transpose(1, 2, 0).astype(np.float32),
            "target": target.transpose(1, 2, 0).astype(np.float32),
            "case": "npy", "slice": s,
        }

    def image_channels(self) -> int:
        return len(self.cond_keys)


def build_volume_cache(h5_root, split: str, keys: Sequence[str], out_dir):
    """H5 slice store -> one stacked [N, H, W] npy per sequence key
    (create_whole_dataset.py parity)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stacks: dict[str, list] = {k: [] for k in keys}
    for case in h5store.list_cases(Path(h5_root) / split):
        for p in h5store.case_slices(Path(h5_root) / split / case):
            row = h5store.read_slice(p, keys)
            for k in keys:
                stacks[k].append(np.asarray(row[k], np.float32))
    paths = {}
    for k in keys:
        arr = np.stack(stacks[k])
        path = out_dir / f"{k}.npy"
        np.save(path, arr)
        paths[k] = path
    return paths
