"""Device-resident dataset cache with on-device augmentation.

TPU-native data plane for datasets that fit in HBM: the whole slice split
is uploaded ONCE, and every training batch is produced on device inside a
jitted function — uniform index sampling, gather, joint random
rotate/flip — so the steady-state input pipeline moves ZERO bytes over
the host↔device link.

Motivations, in order:

1. The host loader feeds ~200 slices/s at 256² (PROFILE.md aux notes);
   the on-device path removes the transfer + layout work entirely and
   scales with the mesh for free (the gather partitions over the 'data'
   axis like any other jit op).
2. The tunneled `axon` platform leaks every host→device staging buffer
   (PROFILE.md §8) — with the cache, a long run performs a handful of
   transfers at startup instead of one per step, making multi-hour
   single-process runs safe even on the leaky tunnel.

Semantic deltas vs the host loader (`data/pipeline.BatchLoader`), both
deliberate and documented:

- batches are uniform-with-replacement index draws (the step-based
  convention of the OpenAI TrainLoop lineage), not epoch shuffles;
- rotation borders use 'mirror' reflection (cv2.BORDER_REFLECT_101)
  instead of the host path's BORDER_REFLECT — a one-pixel phase
  difference at the border, invisible to training.

Augmentation parity target: get_2d_train_transform_diff
(training_transform.py:220-296) — shared random rotation in ±30° applied
jointly to conditions and target, then independent per-axis flips, with
the same ``aug_prob`` gate per sample.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["DeviceCache"]


def _rotate_one(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Bilinear rotate one [H, W, C] image by ``angle`` radians about the
    pixel-grid center (cv2.getRotationMatrix2D convention: center
    (W/2-0.5, H/2-0.5)), mirror border."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # output pixel (y,x) samples input at the inverse-rotated location
    src_y = cy + (yy - cy) * ca - (xx - cx) * sa
    src_x = cx + (yy - cy) * sa + (xx - cx) * ca

    def per_channel(c):
        return jax.scipy.ndimage.map_coordinates(
            c, [src_y, src_x], order=1, mode="mirror")

    return jnp.stack(
        [per_channel(img[:, :, i]) for i in range(img.shape[-1])], axis=-1)


def _augment_pair(image, target, rng, aug_prob, max_deg):
    """Joint rotate+flip of one (image [H,W,Ci], target [H,W,Ct]) pair —
    the transform chain of SliceDataset.get(augment=True) on device."""
    k_rot_gate, k_angle, k_f0, k_f1 = jax.random.split(rng, 4)
    both = jnp.concatenate([image, target], axis=-1)

    do_rot = jax.random.uniform(k_rot_gate) < aug_prob
    angle = jax.random.uniform(
        k_angle, minval=-max_deg, maxval=max_deg) * jnp.pi / 180.0
    both = jax.lax.cond(
        do_rot, lambda b: _rotate_one(b, angle), lambda b: b, both)

    for k, axis in ((k_f0, 0), (k_f1, 1)):
        do_flip = jax.random.uniform(k) < aug_prob
        both = jax.lax.cond(
            do_flip, partial(jnp.flip, axis=axis), lambda b: b, both)
    ci = image.shape[-1]
    return both[..., :ci], both[..., ci:]


class DeviceCache:
    """Whole-split device arrays + a jitted batch sampler.

    ``images``: [N, H, W, C_cond] and ``targets``: [N, H, W, 1], replicated
    over the mesh (every chip holds the split; batches come out sharded
    over the 'data' axis via out_shardings on the sampler).
    """

    def __init__(self, images, targets, mesh=None, dtype=jnp.float32):
        images = jnp.asarray(images, dtype)
        targets = jnp.asarray(targets, dtype)
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            images = jax.device_put(images, rep)
            targets = jax.device_put(targets, rep)
        self.mesh = mesh
        self.images = images
        self.targets = targets
        self.n = int(images.shape[0])

    @classmethod
    def from_dataset(cls, ds, mesh=None, dtype=jnp.float32,
                     max_bytes: int = 8 << 30):
        """Materialize a SliceDataset (augmentation OFF — raw pixels are
        cached, augmentation happens on device per batch)."""
        was_aug = ds.augment
        ds.augment = False
        try:
            rng = np.random.default_rng(0)
            rows = [ds.get(i, rng) for i in range(len(ds))]
        finally:
            ds.augment = was_aug
        images = np.stack([r["image"] for r in rows])
        targets = np.stack([r["target"] for r in rows])
        nbytes = (images.nbytes + targets.nbytes) // (
            2 if dtype == jnp.bfloat16 else 1)
        if nbytes > max_bytes:
            raise ValueError(
                f"split needs {nbytes/1e9:.1f} GB on device (> "
                f"{max_bytes/1e9:.1f} GB cap) — use the host BatchLoader "
                "for datasets that do not fit in HBM")
        return cls(images, targets, mesh=mesh, dtype=dtype)

    def make_batch_fn(self, batch_size: int, augment: bool = True,
                      aug_prob: float = 0.4, max_deg: float = 30.0):
        """jitted rng -> {'image','target','valid'} batch, sharded over
        'data' when a mesh is attached."""
        out_shardings = None
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P("data"))
            out_shardings = {"image": sh, "target": sh,
                            "valid": NamedSharding(self.mesh, P("data"))}

        def sample(rng):
            k_idx, k_aug = jax.random.split(rng)
            idx = jax.random.randint(k_idx, (batch_size,), 0, self.n)
            image = jnp.take(self.images, idx, axis=0).astype(jnp.float32)
            target = jnp.take(self.targets, idx, axis=0).astype(jnp.float32)
            if augment:
                image, target = jax.vmap(
                    _augment_pair, in_axes=(0, 0, 0, None, None)
                )(image, target, jax.random.split(k_aug, batch_size),
                  aug_prob, max_deg)
            return {"image": image, "target": target,
                    "valid": jnp.ones((batch_size,), bool)}

        return jax.jit(sample, out_shardings=out_shardings)
