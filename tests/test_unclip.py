"""unCLIP conditioning e2e with a REAL (tiny, random-weight) HF CLIP snapshot
on disk — the path the reference drives through
ImageEmbeddingConditionedLatentDiffusion (ddpm.py:1860-1930) with
FrozenOpenCLIPImageEmbedder + CLIPEmbeddingNoiseAugmentation."""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(scope="module")
def tiny_clip_snapshot(tmp_path_factory):
    """Write a minimal CLIP vision snapshot (random weights) to disk."""
    from transformers import CLIPVisionConfig, FlaxCLIPVisionModel

    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=32,
    )
    model = FlaxCLIPVisionModel(cfg, seed=0)
    path = tmp_path_factory.mktemp("clip_snapshot")
    model.save_pretrained(str(path))
    return str(path)


def test_clip_image_embedder_real_snapshot(tiny_clip_snapshot):
    from dsdiff_tpu.models import CLIPImageEmbedder

    emb = CLIPImageEmbedder(weights_path=tiny_clip_snapshot)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    out = emb(imgs)
    assert out.shape == (2, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    # deterministic (frozen weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(emb(imgs)),
                               rtol=1e-6)


def test_unclip_crossattn_adm_e2e(tiny_clip_snapshot):
    """Full chain: CLIP image embed -> noise aug + level embedding ->
    crossattn-adm denoiser call -> DDIM sampling step (sample_log parity,
    ddpm.py:1908-1930)."""
    from dsdiff_tpu.core import sampling
    from dsdiff_tpu.core.schedules import DiffusionSchedule, respace, \
        space_timesteps, make_beta_schedule
    from dsdiff_tpu.models import (
        CLIPImageEmbedder, EmbeddingNoiseAugmentation, UNet,
        conditioned_call, unclip_adm_cond,
    )

    embedder = CLIPImageEmbedder(weights_path=tiny_clip_snapshot)
    cond_imgs = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    emb = embedder(cond_imgs)  # [2, 32]

    sched = DiffusionSchedule.named("linear", 100)
    aug = EmbeddingNoiseAugmentation(sched, max_noise_level=50)
    c_adm = unclip_adm_cond(
        emb, jax.random.PRNGKey(0), aug, level_emb_dim=16,
        embedding_dropout=0.5, deterministic=False,
    )
    assert c_adm.shape == (2, 48)  # 32 emb + 16 level embedding

    m = UNet(in_channels=1, out_channels=1, model_channels=8,
             num_res_blocks=1, channel_mult=(1, 2),
             attention_resolutions=(2,), num_heads=2,
             use_spatial_transformer=True, context_dim=8,
             adm_in_channels=48)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 4, 8))
    params = m.init(jax.random.PRNGKey(0), x, t, ctx, c_adm)

    def denoise(xx, tt):
        return conditioned_call(
            lambda a, b, cc=None, y=None: m.apply(params, a, b, cc, y),
            "crossattn-adm", xx, tt,
            {"c_crossattn": [ctx], "c_adm": c_adm},
        )

    rsched = respace(
        np.asarray(make_beta_schedule("linear", 100)),
        space_timesteps(100, "4"),
    )
    out = sampling.ddim_sample_loop(
        rsched, denoise, jnp.zeros((2, 16, 16, 1)), jax.random.PRNGKey(1)
    )
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
