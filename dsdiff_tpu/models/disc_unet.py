"""DisC-Diff multi-stream U-Nets with common/distinct disentanglement.

TPU-native re-design of Disc_diff/guided_diffusion/unet.py:

- 3-stream ``UNetModel`` (x, low_res, other — forward :677-723) and 4-stream
  ``UNet_disc_Model`` (x, T1, T2, DWI split from a 4-channel input,
  :997-1044), unified into one :class:`DiscUNet` with ``n_streams``.
- Per-stream encoders are again ONE vmapped
  :class:`~dsdiff_tpu.models.backbone.UNetEncoder` with per-stream params
  (the reference deep-copies its ModuleLists, :937-940).
- Skip fusion is the stream mean (:700, :1013); bottleneck features pass
  shared ``conv_common`` / ``conv_distinct`` 3x3+SiLU heads (:953-961), the
  common mean gets one SE gate, each distinct feature its own SE gate
  (:942-947), then concat + 1x1 ``dim_reduction`` (:948-951) feeds the middle
  block — note the middle block runs AFTER fusion here, unlike DSUnet.
- Returns ``(out, {'common': [n,B,...], 'distinct': [n,B,...]})`` feeding the
  com/dist MSE disentangle ratio loss
  (Disc_diff/guided_diffusion/gaussian_diffusion.py:898-916).

``SuperResModelNew`` (:1063-1077) is subsumed: conditioning images are just
extra streams.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .backbone import OutHead, UNetDecoder, UNetEncoder, UNetMiddle
from .layers import SEBlock, TimeEmbed

__all__ = ["DiscUNet"]

Dtype = Any


class _ConvSiLU(nn.Module):
    out_channels: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        h = nn.Conv(
            self.out_channels, (self.kernel, self.kernel), padding=pad,
            dtype=self.dtype, name="conv",
        )(x)
        return nn.silu(h)


class DiscUNet(nn.Module):
    n_streams: int = 4
    model_channels: int = 96
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (8, 16)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 4
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    # 'sequential' (dense per-stream convs, TPU-fast) | 'vmap' (grouped
    # convs; params carry a leading [n_streams] axis) — see DSUNet
    stream_mode: str = "sequential"
    remat: bool = False
    dtype: Dtype = jnp.float32

    def _common_kw(self, deterministic: bool) -> dict:
        return dict(
            model_channels=self.model_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            dropout=self.dropout,
            channel_mult=tuple(self.channel_mult),
            conv_resample=self.conv_resample,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            resblock_updown=self.resblock_updown,
            deterministic=deterministic,
            remat=self.remat,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        *,
        deterministic: bool = True,
    ):
        B, H, W, C = x.shape
        n = self.n_streams
        assert C == n, f"DiscUNet({n} streams) expects {n} channels, got {C}"
        streams = jnp.stack([x[..., i : i + 1] for i in range(n)], axis=0)

        ch0 = self.model_channels
        emb = TimeEmbed(ch0, ch0 * 4, dtype=self.dtype, name="time_embed")(t)

        kw = self._common_kw(deterministic)
        if self.stream_mode == "sequential":
            outs = [
                UNetEncoder(**kw, name=f"encoder_{s}")(streams[s], emb)
                for s in range(n)
            ]
            h_all = jnp.stack([o[0] for o in outs], axis=0)
            skips_all = [
                jnp.stack(parts, axis=0)
                for parts in zip(*[o[1] for o in outs])
            ]
        else:
            StreamEncoder = nn.vmap(
                UNetEncoder,
                in_axes=(0, None),
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
            )
            h_all, skips_all = StreamEncoder(**kw, name="encoders")(
                streams, emb
            )

        conv_ch = h_all.shape[-1]
        half = conv_ch // 2
        f_common = _ConvSiLU(half, dtype=self.dtype, name="conv_common")
        f_distinct = _ConvSiLU(half, dtype=self.dtype, name="conv_distinct")

        def apply_head(head, xs):
            k = xs.shape[0]
            flat = xs.reshape((k * B,) + xs.shape[2:])
            out = head(flat)
            return out.reshape((k, B) + out.shape[1:])

        com = apply_head(f_common, h_all)      # [n, B, ...]
        dist = apply_head(f_distinct, h_all)   # [n, B, ...]

        com_h = SEBlock(reduction=8, dtype=self.dtype, name="se_com")(
            jnp.mean(com, axis=0)
        )
        dist_gated = [
            SEBlock(reduction=8, dtype=self.dtype, name=f"se_dist_{i}")(dist[i])
            for i in range(n)
        ]
        h = jnp.concatenate([com_h] + dist_gated, axis=-1)  # (n+1)/2 * conv_ch
        h = nn.Conv(conv_ch, (1, 1), dtype=self.dtype, name="dim_reduction")(h)
        h = nn.silu(h)

        h = UNetMiddle(**kw, name="middle")(h, emb)
        skips = [s.mean(axis=0) for s in skips_all]
        h = UNetDecoder(**kw, name="decoder")(h, skips, emb)
        out = OutHead(self.out_channels, dtype=self.dtype, name="out")(h)

        features = {"common": com, "distinct": jnp.stack(dist_gated, axis=0)}
        return out, features
