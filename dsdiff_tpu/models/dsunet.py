"""DS-Diff: the 4-stream disentangled conditional diffusion U-Net.

TPU-native re-design of the reference's novel DSUnetModel
(UNet_DS_Diff/model.py:171-756):

- Input is channel-stacked ``[noise, anatomy, anatomy+lesion, lesion]``
  (model.py:654-663); a 2-channel input zero-pads the missing streams.
- The reference runs **four deep-copied encoder stacks sequentially**
  (model.py:522-524, 674-686). Here the four streams are a leading vmapped
  axis over ONE :class:`~dsdiff_tpu.models.backbone.UNetEncoder` with
  per-stream parameters (``nn.vmap`` with ``variable_axes={'params': 0}``):
  identical capacity/weights-per-stream, but the MXU sees a 4x-batched sweep
  instead of four small ones.
- Only the noise stream passes the middle block (model.py:688).
- ``FeatureDisentangle`` heads split bottleneck features into style/content
  and anatomy/lesion halves (model.py:152-168, 694-712); head applications
  over multiple streams are folded into the batch axis (one conv call per
  head, not one per stream).
- Stream-mean + SE-projection fusion, concat + ``all_proj`` 1x1 conv back
  into the trunk (model.py:714-738); optional cross-attention fusion from the
  ``the_best_model_backup_crossatten.py`` variant (:408-412, :720-726).
- Decoder skips are the mean of the four encoders' skips (model.py:745).
- Returns ``(prediction, features)`` with the feature groups the contrastive
  losses consume (model.py:751-756) — lists become stacked [k, B, ...] arrays.
- ``use_edge=True`` is the edge-guided (EG) variant of the thesis ablation
  (model_architecture_thesis.md:385-392): the LAST input channel is an edge
  map that is concatenated onto the NOISE stream's stem — the noise encoder
  sees 2 channels, the condition streams are unchanged
  (UNet_DS_Diff/49_model.py:296 — noise stem widened to in+1 — and
  :376,:710-713 — ``input_n = cat([input_n, input_edge])``).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .attention import SpatialTransformer
from .backbone import OutHead, UNetDecoder, UNetEncoder, UNetMiddle
from .layers import GroupNorm32, SEBlock, TimeEmbed

__all__ = ["DSUNet"]

Dtype = Any

N_STREAMS = 4  # noise, anatomy, anatomy+lesion, lesion


class FeatureDisentangle(nn.Module):
    """Residual GN-SiLU-conv then GN-SiLU-1x1 projection to half channels
    (UNet_DS_Diff/model.py:152-168)."""

    half_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = h + x
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.half_channels, (1, 1), dtype=self.dtype, name="conv2"
        )(h)


class _SEProj(nn.Module):
    """SE gate + 3x3 conv (style/content/anatomy/lesion projections,
    model.py:568-596)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = SEBlock(reduction=8, dtype=self.dtype, name="se")(x)
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(h)


class DSUNet(nn.Module):
    in_channels: int = 4
    model_channels: int = 96
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 8)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    use_fft_attention: bool = False
    fusion: str = "concat"  # 'concat' | 'crossattn'
    # 'sequential': four dense per-stream encoders (TPU-fast — grouped convs
    # from the vmapped form run ~1.3-1.8x slower on the MXU at the flagship's
    # shapes); 'vmap': one encoder vmapped over the stream axis (params carry
    # a leading [4] axis)
    stream_mode: str = "sequential"
    # edge guidance (49_model.py:296,376,710-713): the last input channel is
    # an edge map routed onto the noise stream's stem. In 'vmap' mode the
    # condition streams are zero-padded to the noise stream's 2-channel width
    # so one vmapped encoder still serves all four streams (the zero channel's
    # stem weights train but receive no signal — capacity-equivalent to the
    # reference's widened noise stem).
    use_edge: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    def _common(self, deterministic: bool) -> dict:
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
            use_spatial_transformer=self.use_spatial_transformer,
            transformer_depth=self.transformer_depth,
            use_fft_attention=self.use_fft_attention,
            deterministic=deterministic,
            remat=self.remat,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        context: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
    ):
        B, H, W, C = x.shape
        edge = None
        if self.use_edge:
            # edge guidance: last channel is the edge map, destined for the
            # noise stream's stem only (49_model.py:710-713)
            edge = x[..., -1:]
            x = x[..., :-1]
            C -= 1
        # stream split (model.py:652-663); channel-last: [..., 0]=noise
        if C == 2:
            stream_list = [
                x[..., 0:1],
                x[..., 1:2],
                jnp.zeros_like(x[..., 0:1]),
                jnp.zeros_like(x[..., 0:1]),
            ]
        elif C == 3:
            # two conditions: lesion stream zero-padded (extends the
            # reference's 2-channel fallback to 3)
            stream_list = [
                x[..., 0:1],
                x[..., 1:2],
                x[..., 2:3],
                jnp.zeros_like(x[..., 0:1]),
            ]
        elif C == N_STREAMS:
            # [noise, anatomy, anatomy+lesion, lesion]
            stream_list = [x[..., i : i + 1] for i in range(N_STREAMS)]
        else:
            raise ValueError(
                f"DSUNet expects 2-4 input channels"
                f"{' plus an edge channel' if self.use_edge else ''}, "
                f"got {C}"
            )
        if edge is not None:
            stream_list[0] = jnp.concatenate([stream_list[0], edge], axis=-1)

        ch0 = self.model_channels
        time_dim = ch0 * 4
        emb = TimeEmbed(ch0, time_dim, dtype=self.dtype, name="time_embed")(t)

        kw = self._common(deterministic)
        if self.stream_mode == "sequential":
            # four dense per-stream encoders: XLA lowers the vmapped form to
            # feature_group_count=4 grouped convs, which the MXU runs at
            # ~0.55-0.75x the dense-conv rate at 256^2/128^2 (measured,
            # scripts/grouped_conv_probe.py) — sequential dense calls win
            outs = [
                UNetEncoder(**kw, name=f"encoder_{s}")(
                    stream_list[s], emb, context
                )
                for s in range(N_STREAMS)
            ]
            h_all = jnp.stack([o[0] for o in outs], axis=0)
            skips_all = [
                jnp.stack(parts, axis=0)
                for parts in zip(*[o[1] for o in outs])
            ]
        else:
            # one encoder vmapped over the stream axis, per-stream params;
            # streams must share a channel width, so under use_edge the
            # condition streams get a zero channel alongside (see attr doc)
            width = max(s.shape[-1] for s in stream_list)
            streams = jnp.stack(
                [
                    s if s.shape[-1] == width else jnp.concatenate(
                        [s, jnp.zeros(s.shape[:-1] + (width - s.shape[-1],),
                                      s.dtype)], axis=-1
                    )
                    for s in stream_list
                ],
                axis=0,
            )
            StreamEncoder = nn.vmap(
                UNetEncoder,
                in_axes=(0, None, None),
                out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
            )
            h_all, skips_all = StreamEncoder(**kw, name="encoders")(
                streams, emb, context
            )
        # h_all: [4, B, h, w, ch]; skips_all: list of [4, B, ...]
        h_n = UNetMiddle(**kw, name="middle")(h_all[0], emb, context)
        h_a, h_al, h_l = h_all[1], h_all[2], h_all[3]

        conv_ch = h_n.shape[-1]
        half = conv_ch // 2
        f_style = FeatureDisentangle(half, dtype=self.dtype, name="conv_style")
        f_content = FeatureDisentangle(half, dtype=self.dtype, name="conv_content")
        f_anatomy = FeatureDisentangle(half, dtype=self.dtype, name="conv_anatomy")
        f_lesion = FeatureDisentangle(half, dtype=self.dtype, name="conv_lesion")

        # fold stream applications into the batch axis: one conv per head
        def apply_head(head, xs):
            k = xs.shape[0]
            flat = xs.reshape((k * B,) + xs.shape[2:])
            out = head(flat)
            return out.reshape((k, B) + out.shape[1:])

        four = jnp.stack([h_n, h_a, h_al, h_l], axis=0)
        styles4 = apply_head(f_style, four)      # [4,B,...] n,a,al,l
        contents4 = apply_head(f_content, four)
        anat2 = apply_head(f_anatomy, jnp.stack([h_a, h_al], axis=0))
        les2 = apply_head(f_lesion, jnp.stack([h_al, h_l], axis=0))

        h_n_style, style_list = styles4[0], styles4[1:]     # a,al,l styles
        h_n_content, content_list = contents4[0], contents4[1:]

        h_style = _SEProj(dtype=self.dtype, name="style_proj")(
            jnp.mean(style_list, axis=0)
        )
        h_share_content = _SEProj(dtype=self.dtype, name="share_content_proj")(
            jnp.mean(content_list, axis=0)
        )
        h_anatomy = _SEProj(dtype=self.dtype, name="anatomy_proj")(
            jnp.mean(anat2, axis=0)
        )
        h_lesion = _SEProj(dtype=self.dtype, name="lesion_proj")(
            jnp.mean(les2, axis=0)
        )

        if self.fusion == "crossattn":
            # the_best_model_backup_crossatten.py:408-412,720-726: depth-4
            # cross-attention over the disentangled features as context tokens
            ctx = jnp.concatenate(
                [
                    f.reshape(B, -1, half)
                    for f in (h_share_content, h_style, h_anatomy, h_lesion)
                ],
                axis=1,
            )
            heads = max(self.num_heads, 1)
            h = SpatialTransformer(
                depth=4,
                heads=heads,
                dim_head=conv_ch // heads,
                deterministic=deterministic,
                dtype=self.dtype,
                name="fusion_attn",
            )(h_n, ctx)
        else:
            fused = jnp.concatenate(
                [h_n, h_share_content, h_style, h_anatomy, h_lesion], axis=-1
            )
            h = nn.silu(fused)
            h = nn.Conv(
                conv_ch, (1, 1), dtype=self.dtype, name="all_proj"
            )(h)

        # decoder with mean-of-streams skips (model.py:745)
        skips = [s.mean(axis=0) for s in skips_all]
        h = UNetDecoder(**kw, name="decoder")(h, skips, emb, context)
        out = OutHead(self.out_channels, dtype=self.dtype, name="out")(h)

        features = {
            "style": style_list,          # [3, B, ...] a/al/l
            "content": content_list,      # [3, B, ...]
            "anatomy": anat2,             # [2, B, ...] a/al
            "lesion": les2,               # [2, B, ...] al/l
            "n_style_content": jnp.stack(
                [h_style, h_n_style, h_share_content, h_n_content], axis=0
            ),                            # [4, B, ...] (model.py:727)
        }
        return out, features
