"""U-Net encoder / middle / decoder components shared by all U-Net families.

Factoring the reference's input_blocks / middle_block / output_blocks
(ldm/modules/diffusionmodules/openaimodel.py:660-772) into standalone Flax
modules lets the DS-Diff and DisC models reuse one implementation:

- :class:`UNetEncoder` == input_blocks (in-conv + res/attn stages + downsample)
  returning the skip stack,
- :class:`UNetMiddle` == middle_block (res - attn - res),
- :class:`UNetDecoder` == output_blocks (skip-concat res/attn stages +
  upsample).

The DSUnet vmaps :class:`UNetEncoder` over a leading stream axis with
per-stream parameters — the TPU-native equivalent of the reference's four
deep-copied encoder ModuleLists (UNet_DS_Diff/model.py:522-524), executing as
one batched sweep instead of four sequential ones.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .attention import AttentionBlock, SpatialTransformer
from .layers import Downsample, GroupNorm32, ResBlock, Upsample, zero_init

__all__ = ["UNetEncoder", "UNetMiddle", "UNetDecoder", "OutHead"]

Dtype = Any


class _Common(nn.Module):
    model_channels: int = 96
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
    deterministic: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32

    def _res(self, name: str, **kw):
        cls = nn.remat(ResBlock) if self.remat else ResBlock
        return cls(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            deterministic=self.deterministic,
            dtype=self.dtype,
            name=name,
            **kw,
        )

    def _attn(self, h, ch: int, name: str, context):
        if self.use_spatial_transformer:
            heads = (
                self.num_heads
                if self.num_head_channels == -1
                else ch // self.num_head_channels
            )
            return SpatialTransformer(
                depth=self.transformer_depth,
                heads=heads,
                dim_head=ch // heads,
                dropout=self.dropout,
                use_fft=self.use_fft_attention,
                deterministic=self.deterministic,
                dtype=self.dtype,
                name=name,
            )(h, context)
        return AttentionBlock(
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            dtype=self.dtype,
            name=name,
        )(h)


class UNetEncoder(_Common):
    """in-conv + down stages; returns (h, skips) with one skip per block."""

    @nn.compact
    def __call__(self, x, emb, context=None):
        ch0 = self.model_channels
        h = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(
            x.astype(self.dtype)
        )
        skips = [h]
        ds = 1
        ch = ch0
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = mult * ch0
                h = self._res(f"down_{level}_{i}_res", out_channels=ch)(h, emb)
                if ds in self.attention_resolutions:
                    h = self._attn(h, ch, f"down_{level}_{i}_attn", context)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = self._res(f"down_{level}_ds", out_channels=ch,
                                  down=True)(h, emb)
                else:
                    h = Downsample(
                        self.conv_resample, dtype=self.dtype,
                        name=f"down_{level}_ds",
                    )(h)
                skips.append(h)
                ds *= 2
        return h, skips


class UNetMiddle(_Common):
    """res - attn - res bottleneck."""

    @nn.compact
    def __call__(self, h, emb, context=None):
        ch = h.shape[-1]
        h = self._res("mid_res1", out_channels=ch)(h, emb)
        h = self._attn(h, ch, "mid_attn", context)
        h = self._res("mid_res2", out_channels=ch)(h, emb)
        return h


class UNetDecoder(_Common):
    """up stages consuming the skip stack (pops from the end)."""

    @nn.compact
    def __call__(self, h, skips, emb, context=None):
        skips = list(skips)
        ch0 = self.model_channels
        ds = 2 ** (len(self.channel_mult) - 1)
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                ch = mult * ch0
                h = self._res(f"up_{level}_{i}_res", out_channels=ch)(h, emb)
                if ds in self.attention_resolutions:
                    h = self._attn(h, ch, f"up_{level}_{i}_attn", context)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = self._res(f"up_{level}_us", out_channels=ch,
                                      up=True)(h, emb)
                    else:
                        h = Upsample(
                            self.conv_resample, dtype=self.dtype,
                            name=f"up_{level}_us",
                        )(h)
                    ds //= 2
        assert not skips, "skip stack should be empty"
        return h


class OutHead(nn.Module):
    """GN + SiLU + zero-init 3x3 out conv (openaimodel.py:758-763)."""

    out_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        h = GroupNorm32(dtype=self.dtype, name="norm")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=zero_init(),
            dtype=self.dtype, name="conv",
        )(h)
        return h.astype(jnp.float32)
