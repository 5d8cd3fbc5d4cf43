"""SD/OpenAI-style conditional diffusion U-Net.

TPU-native re-design of the vendored SD2.1 UNetModel
(ldm/modules/diffusionmodules/openaimodel.py:571-958) and the OpenAI
guided-diffusion UNetModel trunk (Disc_diff/guided_diffusion/unet.py:355-723),
composed from the shared encoder/middle/decoder in
:mod:`dsdiff_tpu.models.backbone`. NHWC, bf16-aware, with optional
class / vector ('adm') conditioning added to the time embedding
(openaimodel.py:637-655). ``learn_sigma`` is expressed by the caller doubling
``out_channels``. Conditioning by concatenation (the DS-Diff 'concat' mode,
ldm/models/diffusion/ddpm.py:1331-1333) is the caller stacking channels into
``x``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .backbone import OutHead, UNetDecoder, UNetEncoder, UNetMiddle
from .layers import TimeEmbed

__all__ = ["UNet"]

Dtype = Any


class UNet(nn.Module):
    in_channels: int = 1
    model_channels: int = 96
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 8)  # downsample rates with attn
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_heads: int = 8
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    use_fft_attention: bool = False
    num_classes: Optional[int] = None
    adm_in_channels: Optional[int] = None
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
        y: jnp.ndarray | None = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ch0 = self.model_channels
        time_dim = ch0 * 4
        emb = TimeEmbed(ch0, time_dim, dtype=self.dtype, name="time_embed")(t)
        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs y"
            emb = emb + nn.Embed(
                self.num_classes, time_dim, dtype=self.dtype, name="label_emb"
            )(y)
        elif self.adm_in_channels is not None:
            assert y is not None, "adm-conditional model needs vector y"
            v = nn.Dense(time_dim, dtype=self.dtype, name="adm_fc1")(y)
            v = nn.silu(v)
            emb = emb + nn.Dense(time_dim, dtype=self.dtype, name="adm_fc2")(v)

        kw = self._common(deterministic)
        h, skips = UNetEncoder(**kw, name="encoder")(x, emb, context)
        h = UNetMiddle(**kw, name="middle")(h, emb, context)
        h = UNetDecoder(**kw, name="decoder")(h, skips, emb, context)
        return OutHead(self.out_channels, dtype=self.dtype, name="out")(h)
