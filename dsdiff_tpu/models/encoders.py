"""Conditioning encoders: class embeddings, CLIP wrappers, noise augmentation.

Re-design of ldm/modules/encoders/modules.py:

- :class:`ClassEmbedder` (:27-56): label -> embedding with train-time
  unconditional-class dropout for CFG.
- :class:`CLIPTextEmbedder` / :class:`CLIPImageEmbedder`: the FrozenCLIP /
  FrozenOpenCLIPImageEmbedder capability (:92-320) via HuggingFace
  ``transformers`` CLIP models **loaded from a local path** — this
  environment has no network egress, so construction requires
  ``weights_path`` pointing at a local snapshot; absent weights raise a
  clear error instead of downloading.
- :class:`EmbeddingNoiseAugmentation` (:321-351 CLIPEmbeddingNoiseAugmentation):
  q-sample diffusion noise applied to embedding vectors with the noise level
  returned for 'adm' conditioning, using the same
  :class:`~dsdiff_tpu.core.schedules.DiffusionSchedule` tables.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import process
from ..core.schedules import DiffusionSchedule

__all__ = [
    "ClassEmbedder",
    "EmbeddingNoiseAugmentation",
    "CLIPTextEmbedder",
    "CLIPImageEmbedder",
    "unclip_adm_cond",
]


class ClassEmbedder(nn.Module):
    """Label embedding with CFG dropout to the null class
    (modules.py:27-56)."""

    n_classes: int
    embed_dim: int = 512
    ucg_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, *, deterministic: bool = True):
        if not deterministic and self.ucg_rate > 0:
            rng = self.make_rng("dropout")
            drop = jax.random.uniform(rng, y.shape) < self.ucg_rate
            y = jnp.where(drop, self.n_classes - 1, y)
        return nn.Embed(self.n_classes, self.embed_dim, dtype=self.dtype,
                        name="embedding")(y)


class EmbeddingNoiseAugmentation:
    """Noise-augment conditioning embeddings (unCLIP style).

    Reference CLIPEmbeddingNoiseAugmentation (modules.py:321-351): normalize
    by dataset mean/std, q-sample at a random (or given) noise level, return
    (noisy embedding, level) — the level feeds 'adm' vector conditioning.
    """

    def __init__(
        self,
        sched: DiffusionSchedule,
        max_noise_level: int | None = None,
        mean: jnp.ndarray | float = 0.0,
        std: jnp.ndarray | float = 1.0,
    ):
        self.sched = sched
        self.max_noise_level = max_noise_level or sched.num_timesteps
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)

    def __call__(self, emb: jnp.ndarray, rng: jax.Array,
                 noise_level: jnp.ndarray | None = None):
        B = emb.shape[0]
        t_rng, n_rng = jax.random.split(rng)
        if noise_level is None:
            noise_level = jax.random.randint(
                t_rng, (B,), 0, self.max_noise_level
            )
        z = (emb - self.mean) / self.std
        noise = jax.random.normal(n_rng, z.shape, z.dtype)
        z = process.q_sample(self.sched, z, noise_level, noise)
        return z * self.std + self.mean, noise_level


def unclip_adm_cond(
    emb: jnp.ndarray,
    rng: jax.Array,
    aug: "EmbeddingNoiseAugmentation",
    level_emb_dim: int = 0,
    embedding_dropout: float = 0.0,
    deterministic: bool = True,
) -> jnp.ndarray:
    """CLIP embedding -> 'adm' vector conditioning, unCLIP style.

    Mirrors ImageEmbeddingConditionedLatentDiffusion.get_input
    (ddpm.py:1889-1903): noise-augment the embedding, append a sinusoidal
    embedding of the noise level when ``level_emb_dim``>0, and (training
    only) drop whole conditioning rows with prob ``embedding_dropout``.
    """
    from .layers import timestep_embedding

    a_rng, d_rng = jax.random.split(rng)
    noisy, level = aug(emb, a_rng)
    if level_emb_dim > 0:
        lvl = timestep_embedding(level.astype(jnp.float32), level_emb_dim)
        noisy = jnp.concatenate([noisy, lvl], axis=1)
    if not deterministic and embedding_dropout > 0:
        keep = (
            jax.random.uniform(d_rng, (noisy.shape[0], 1))
            >= embedding_dropout
        ).astype(noisy.dtype)
        noisy = noisy * keep
    return noisy


def _require_transformers(weights_path):
    if not weights_path:
        raise ValueError(
            "CLIP encoders need a local weights snapshot (no network egress "
            "in this environment); pass weights_path=<local dir>"
        )
    import transformers  # noqa: F401  (baked in)

    return weights_path


class CLIPTextEmbedder:
    """Frozen CLIP text encoder (FrozenCLIPEmbedder capability,
    modules.py:92-140) from a local HF snapshot. Returns last hidden states
    [B, N, D] for cross-attention conditioning."""

    def __init__(self, weights_path: str, max_length: int = 77):
        path = _require_transformers(weights_path)
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        self.tokenizer = CLIPTokenizer.from_pretrained(path)
        self.model = FlaxCLIPTextModel.from_pretrained(path)
        self.max_length = max_length

    def __call__(self, texts: list[str]) -> jnp.ndarray:
        tok = self.tokenizer(
            texts, truncation=True, max_length=self.max_length,
            padding="max_length", return_tensors="np",
        )
        out = self.model(input_ids=tok["input_ids"])
        return out.last_hidden_state


class CLIPImageEmbedder:
    """Frozen CLIP image encoder (FrozenOpenCLIPImageEmbedder capability,
    modules.py:240-320) from a local HF snapshot. Returns pooled image
    embeddings [B, D] for 'adm' conditioning."""

    def __init__(self, weights_path: str):
        path = _require_transformers(weights_path)
        from transformers import FlaxCLIPVisionModel

        self.model = FlaxCLIPVisionModel.from_pretrained(path)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        # images: [B, H, W, 3] in [-1, 1] -> CLIP NCHW pixel values
        pixel_values = jnp.transpose(images, (0, 3, 1, 2))
        out = self.model(pixel_values=pixel_values)
        return out.pooler_output
