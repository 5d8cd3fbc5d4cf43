"""Aux utilities: misc helpers, visualization, conditioning encoders."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.core.schedules import DiffusionSchedule
from dsdiff_tpu.models import ClassEmbedder, EmbeddingNoiseAugmentation
from dsdiff_tpu.utils import misc


def test_tensor2im():
    img = misc.tensor2im(np.zeros((4, 4, 1), np.float32))
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img, 127)


def test_image_pool():
    pool = misc.ImagePool(pool_size=2, seed=0)
    b1 = np.ones((2, 4, 4, 1), np.float32)
    out1 = pool.query(b1)
    np.testing.assert_allclose(out1, b1)  # fills the pool
    b2 = np.full((2, 4, 4, 1), 2.0, np.float32)
    out2 = pool.query(b2)
    assert out2.shape == b2.shape  # may mix history


def test_heatmap():
    hm = misc.heatmap_to_rgb(np.array([[-1.0, 1.0]]))
    assert hm.shape == (1, 2, 3)
    assert hm[0, 0, 2] > hm[0, 0, 0]  # -1 -> blue
    assert hm[0, 1, 0] > hm[0, 1, 2]  # +1 -> red


def test_heatmap_nan_safe():
    # 0/0 cosine similarities (zero-variance features early in training)
    # must not reach the uint8 cast as NaN (np.clip propagates NaN)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        hm = misc.heatmap_to_rgb(np.array([[np.nan, 1.0]]))
    assert hm.dtype == np.uint8 and np.all(hm <= 255)


def test_class_embedder_dropout():
    m = ClassEmbedder(n_classes=4, embed_dim=8, ucg_rate=1.0)
    y = jnp.array([0, 1, 2])
    p = m.init(jax.random.PRNGKey(0), y)
    e_det = m.apply(p, y)
    assert e_det.shape == (3, 8)
    # full dropout -> all map to null class (n_classes-1)
    e_drop = m.apply(p, y, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    null = m.apply(p, jnp.array([3, 3, 3]))
    np.testing.assert_allclose(np.asarray(e_drop), np.asarray(null))


def test_embedding_noise_augmentation():
    sched = DiffusionSchedule.named("linear", 100)
    aug = EmbeddingNoiseAugmentation(sched, max_noise_level=50)
    emb = jnp.ones((4, 16))
    out, level = aug(emb, jax.random.PRNGKey(0))
    assert out.shape == emb.shape and level.shape == (4,)
    assert int(level.max()) < 50
    # level 0 with zero noise influence keeps scale ~ sqrt(acp[0])
    out0, _ = aug(emb, jax.random.PRNGKey(1),
                  noise_level=jnp.zeros((4,), jnp.int32))
    assert float(jnp.abs(out0 - emb).mean()) < 0.1


def test_visualize_outputs(tmp_path):
    from dsdiff_tpu.eval import visualize
    from dsdiff_tpu.eval.assemble import write_metric_report

    rows = [{"case": f"c{i}", "psnr": 20 + i, "ssim": 0.8} for i in range(4)]
    rp = write_metric_report(rows, tmp_path / "m.csv")
    p1 = visualize.metric_boxplot({"ours": rp}, "psnr", tmp_path / "box.png")
    p2 = visualize.metric_barplot({"ours": rp}, ["psnr", "ssim"],
                                  tmp_path / "bar.png")
    gt = np.random.default_rng(0).normal(size=(16, 16, 4))
    p3 = visualize.difference_map(gt, gt * 0.9, tmp_path / "diff.png")
    feats = {"style": np.random.default_rng(1).normal(size=(20, 8)),
             "content": np.random.default_rng(2).normal(size=(20, 8))}
    p4 = visualize.tsne_features(feats, tmp_path / "tsne.png", perplexity=5)
    p5 = visualize.pixel_profile({"gt": gt, "pred": gt * 0.9}, row=8,
                                 out_path=tmp_path / "prof.png")
    for p in (p1, p2, p3, p4, p5):
        assert p.exists() and p.stat().st_size > 0


def test_disentangle_heatmaps(tmp_path):
    from dsdiff_tpu.eval.visualize import disentangle_heatmaps

    k = jax.random.PRNGKey(0)
    feats = {
        "content": jax.random.normal(k, (3, 2, 4, 4, 8)),
        "style": jax.random.normal(jax.random.PRNGKey(1), (3, 2, 4, 4, 8)),
        "anatomy": jax.random.normal(jax.random.PRNGKey(2), (2, 2, 4, 4, 8)),
        "lesion": jax.random.normal(jax.random.PRNGKey(3), (2, 2, 4, 4, 8)),
    }
    paths = disentangle_heatmaps(feats, tmp_path)
    assert len(paths) == 4 and all(p.exists() for p in paths)
