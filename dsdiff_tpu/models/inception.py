"""InceptionV3 feature extractor for FID, in Flax.

The reference computes FID with torchmetrics' pretrained InceptionV3
(inference/test_metrics.py:326-352). Weight download is impossible in this
environment, so this module provides the architecture + a mechanical
torchvision-layout key map: point :func:`load_inception` at a local
``pt_inception``/torchvision ``inception_v3`` checkpoint and
:mod:`dsdiff_tpu.eval.fid` computes true FID (pool3, 2048-d).

Faithful to the pt-FID variant: 3x3 stride-1 average pools use
``count_include_pad=False`` and Mixed_7c's pool branch uses **max** pooling
(pytorch-fid's ``FIDInceptionE_2`` patches ``Mixed_7c`` to
``max_pool2d(3, stride=1, padding=1)``; ``Mixed_7b``/``FIDInceptionE_1``
stays average). ``variant='torchvision'`` keeps both average, matching plain
torchvision ``inception_v3`` weights. Module names mirror the torch names
exactly so the key map is mechanical.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["InceptionV3", "map_inception", "load_inception"]


def _avg_pool3_nocount(x):
    """3x3 stride-1 SAME average pool with count_include_pad=False."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return s / cnt


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Sequence = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, tuple(self.kernel), strides=tuple(self.strides),
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.1, name="bn")(x)
        return nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1),
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool3_nocount(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2),
                         name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool3_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # 'avg' for Mixed_7b (and torchvision Mixed_7c); 'max' for the pt-FID
    # Mixed_7c patch (pytorch-fid FIDInceptionE_2).
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((0, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((1, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((0, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((1, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        else:
            bp = _avg_pool3_nocount(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Trunk to the 2048-d pool3 features (no aux/fc heads).

    variant='pt_fid' (default) applies pytorch-fid's Mixed_7c max-pool
    patch so features match the reference's torchmetrics FID; use
    'torchvision' for plain torchvision inception_v3 weights.
    """

    resize_input: bool = True
    variant: str = "pt_fid"

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] in [-1, 1] -> [B, 2048]."""
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[-1]), "bilinear"
            )
        h = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        h = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(h)
        h = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(h)
        h = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = InceptionA(32, name="Mixed_5b")(h)
        h = InceptionA(64, name="Mixed_5c")(h)
        h = InceptionA(64, name="Mixed_5d")(h)
        h = InceptionB(name="Mixed_6a")(h)
        h = InceptionC(128, name="Mixed_6b")(h)
        h = InceptionC(160, name="Mixed_6c")(h)
        h = InceptionC(160, name="Mixed_6d")(h)
        h = InceptionC(192, name="Mixed_6e")(h)
        h = InceptionD(name="Mixed_7a")(h)
        h = InceptionE(name="Mixed_7b")(h)
        pool_7c = "max" if self.variant == "pt_fid" else "avg"
        h = InceptionE(pool_mode=pool_7c, name="Mixed_7c")(h)
        return jnp.mean(h, axis=(1, 2))  # adaptive avg pool -> [B, 2048]


def map_inception(sd: dict) -> dict:
    """torchvision/pt-FID inception state_dict -> flax variable paths."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[-2:] == ["conv", "weight"]:
            out["params/" + "/".join(parts[:-1]) + "/kernel"] = (
                v.transpose(2, 3, 1, 0)
            )
        elif parts[-2] == "bn":
            leaf = {
                "weight": ("params", "scale"),
                "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var"),
            }.get(parts[-1])
            if leaf is not None:
                col, name = leaf
                out[f"{col}/" + "/".join(parts[:-1]) + f"/{name}"] = v
    return out


def load_inception(path, resize_input: bool = True, variant: str = "pt_fid"):
    """Local inception checkpoint -> (module, variables) ready for FID.

    variant='pt_fid' for pt_inception-2015-12-05 weights (the FID standard,
    what torchmetrics/pytorch-fid use); 'torchvision' for plain
    torchvision inception_v3 weights.
    """
    from ..utils import torch_io

    sd = torch_io.load_checkpoint(path)
    mapped = map_inception(sd)
    net = InceptionV3(resize_input=resize_input, variant=variant)
    target = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )
    target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), target)
    variables, missing, _unused = torch_io.assign(target, mapped,
                                                  make_fit=False)
    if missing:
        raise ValueError(
            f"inception weights incomplete: {len(missing)} missing, "
            f"e.g. {missing[:4]}"
        )
    return net, variables
