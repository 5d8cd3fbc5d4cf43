"""Device-resident dataset cache (data/device_cache.py): gather fidelity,
on-device augmentation parity with the host transform chain, and the
Trainer integration flag."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.data.device_cache import DeviceCache, _rotate_one
from dsdiff_tpu.data.pipeline import SliceDataset
from dsdiff_tpu.parallel import mesh as pmesh
from dsdiff_tpu.train import Config, Trainer

from test_train import _tiny_dataset


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    root = tmp_path_factory.mktemp("dcache")
    data = _tiny_dataset(root, hw=16)
    ds = SliceDataset(data, split="images_tr_16", keys=["A", "B"],
                      augment=False)
    return ds


def test_cache_gathers_real_rows(tiny):
    cache = DeviceCache.from_dataset(tiny)
    assert cache.n == len(tiny)
    fn = cache.make_batch_fn(4, augment=False)
    batch = jax.device_get(fn(jax.random.PRNGKey(0)))
    # hw=16 slices arrive divisible_pad-ed to 32 (SliceDataset pad_to)
    assert batch["image"].shape == (4, 32, 32, 1)
    assert batch["target"].shape == (4, 32, 32, 1)
    assert batch["valid"].all()
    # every sampled row must be byte-identical to SOME dataset row
    rng = np.random.default_rng(0)
    all_imgs = np.stack([tiny.get(i, rng)["image"] for i in range(len(tiny))])
    for row in batch["image"]:
        diffs = np.abs(all_imgs - row[None]).reshape(len(tiny), -1).max(1)
        assert diffs.min() < 1e-6


def test_cache_batch_determinism(tiny):
    cache = DeviceCache.from_dataset(tiny)
    fn = cache.make_batch_fn(4, augment=True, aug_prob=0.9)
    b1 = jax.device_get(fn(jax.random.PRNGKey(3)))
    b2 = jax.device_get(fn(jax.random.PRNGKey(3)))
    b3 = jax.device_get(fn(jax.random.PRNGKey(4)))
    np.testing.assert_array_equal(b1["image"], b2["image"])
    assert np.abs(b1["image"] - b3["image"]).max() > 1e-6


def test_rotate_matches_host_cv2():
    """_rotate_one must match the host chain's cv2.warpAffine (same center
    convention, bilinear) on the interior; borders differ by design
    (mirror vs BORDER_REFLECT)."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    base = rng.normal(size=(24, 24)).astype(np.float32)
    img = cv2.GaussianBlur(base, (7, 7), 2.0)  # smooth: bilinear-friendly
    angle_deg = 17.0
    M = cv2.getRotationMatrix2D((24 / 2 - 0.5, 24 / 2 - 0.5), angle_deg, 1.0)
    ref = cv2.warpAffine(img, M, (24, 24), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
    # cv2's positive angle is counter-clockwise in image coords
    got = np.asarray(_rotate_one(
        jnp.asarray(img)[:, :, None],
        jnp.asarray(-np.deg2rad(angle_deg), jnp.float32)))[:, :, 0]
    got2 = np.asarray(_rotate_one(
        jnp.asarray(img)[:, :, None],
        jnp.asarray(np.deg2rad(angle_deg), jnp.float32)))[:, :, 0]
    interior = (slice(4, -4), slice(4, -4))
    err = min(np.abs(got[interior] - ref[interior]).max(),
              np.abs(got2[interior] - ref[interior]).max())
    assert err < 5e-3, err


def test_rotate_roundtrip_identity():
    # smooth field: bilinear resampling of white noise never round-trips
    yy, xx = np.mgrid[:20, :20] / 20.0
    img = jnp.asarray(np.stack(
        [np.sin(3 * xx + 2 * yy), np.cos(2 * xx - yy)], -1,
    ).astype(np.float32))
    fwd = _rotate_one(img, jnp.asarray(0.3))
    back = _rotate_one(fwd, jnp.asarray(-0.3))
    interior = (slice(5, -5), slice(5, -5))
    assert np.abs(np.asarray(back - img))[interior].mean() < 0.02


def test_trainer_device_cache_flag(tmp_path):
    data = _tiny_dataset(tmp_path, hw=16)
    cfg = Config.wrap(dict(
        net_mode="ddpm", train_keys=["A", "B"],
        h5_2d_img_dir=str(data), image_size=16,
        train_batch_size=8, val_batch_size=8, fold_K=2, fold_idx=0,
        diffusion_steps=10, disentangle_distance=None,
        device_data_cache=True,
        unet_config={"params": {"model_channels": 8, "num_res_blocks": 1,
                                "channel_mult": [1, 2],
                                "attention_resolutions": [],
                                "num_heads": 1}},
        num_epochs=1, lr=1e-3, bf16=False,
        sampler_setting={"sampler": "ddim", "sample_steps": 2},
        log_images=False,
    ))
    tr = Trainer(cfg, tmp_path / "run")
    step = tr.fit(num_epochs=1, max_steps=2, log_every=1,
                  val_every_epochs=10 ** 9)
    assert step == 2
    tr.ckpt.close()


def test_cache_hbm_cap(tiny):
    with pytest.raises(ValueError, match="GB on device"):
        DeviceCache.from_dataset(tiny, max_bytes=1)


def test_cache_sharded_over_mesh(tiny):
    mesh = pmesh.make_mesh()
    cache = DeviceCache.from_dataset(tiny, mesh=mesh)
    fn = cache.make_batch_fn(8, augment=False)
    batch = fn(jax.random.PRNGKey(1))
    shard_devs = {s.device for s in batch["image"].addressable_shards}
    assert len(shard_devs) == mesh.devices.size  # gathered batch is DP-sharded
