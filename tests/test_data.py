"""Data-plane tests: NIfTI codec, H5 store, transforms, loader, preprocess."""
import numpy as np
import pytest

from dsdiff_tpu.data import (
    BatchLoader, Nifti, SliceDataset, h5store, preprocess, read_nifti,
    transforms, write_nifti,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(12, 10, 7)).astype(np.float32)
    aff = np.diag([1.5, 1.5, 3.0, 1.0])
    aff[:3, 3] = [10, -5, 2]
    p = tmp_path / "vol.nii.gz"
    write_nifti(p, Nifti(data, aff))
    back = read_nifti(p)
    np.testing.assert_allclose(back.data, data, rtol=1e-6)
    np.testing.assert_allclose(back.affine, aff)
    np.testing.assert_allclose(back.spacing, (1.5, 1.5, 3.0))


def test_nifti_uncompressed_and_like(tmp_path):
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    p = tmp_path / "v.nii"
    write_nifti(p, Nifti(data))
    back = read_nifti(p)
    np.testing.assert_allclose(back.data, data)
    pred = Nifti.like(np.zeros_like(data), back)
    np.testing.assert_allclose(pred.affine, back.affine)
    with pytest.raises(AssertionError):
        Nifti.like(np.zeros((1, 2, 3)), back)


def _make_store(root, n_cases=3, n_slices=4, hw=32):
    rng = np.random.default_rng(1)
    keys = ["F_Data1", "F_Data2", "S_Data1", "S_Data2"]
    for c in range(n_cases):
        case = f"case{c:02d}"
        for i in range(n_slices):
            h5store.write_slice(
                root / "images_tr_256" / case / f"layer_{i}.h5",
                {k: rng.normal(size=(hw, hw)).astype(np.float32)
                 for k in keys},
            )
    return keys


def test_h5_store_and_kfold(tmp_path):
    keys = _make_store(tmp_path)
    cases = h5store.list_cases(tmp_path / "images_tr_256")
    assert cases == ["case00", "case01", "case02"]
    slices = h5store.case_slices(tmp_path / "images_tr_256" / "case00")
    assert len(slices) == 4
    assert h5store.slice_index(slices[2]) == 2
    d = h5store.read_slice(slices[0], keys)
    assert set(d) == set(keys)
    tr, va = h5store.kfold_split(cases, 3, 0, seed=7)
    tr2, va2 = h5store.kfold_split(cases, 3, 0, seed=7)
    assert tr == tr2 and va == va2
    assert sorted(tr + va) == cases


def test_divisible_pad():
    x = np.ones((1, 30, 45), np.float32)
    y = transforms.divisible_pad(x, 32)
    assert y.shape == (1, 32, 64)


def test_edge_maps_shapes():
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, size=(2, 32, 32)).astype(np.float32)
    for kind in ["sobel", "laplacian", "canny", "sobel&laplacian"]:
        e = transforms.edge_map(img, kind, rng)
        assert e.shape == (1, 32, 32)
        assert e.min() >= 0.0 and e.max() <= 1.0 + 1e-6
    with pytest.raises(ValueError):
        transforms.edge_map(img, "bogus", rng)


def test_rotate_flip_deterministic():
    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    x = np.random.default_rng(0).normal(size=(1, 16, 16)).astype(np.float32)
    a1, = transforms.random_rotate([x], rng1, prob=1.0)
    a2, = transforms.random_rotate([x], rng2, prob=1.0)
    np.testing.assert_allclose(a1, a2)
    assert not np.allclose(a1, x)


def test_slice_dataset_and_loader(tmp_path):
    keys = _make_store(tmp_path, hw=30)  # pads to 32
    ds = SliceDataset(tmp_path, keys=keys, augment=True, use_edge="sobel")
    assert len(ds) == 12
    assert ds.image_channels() == 4  # 3 conds + edge
    row = ds.get(0, np.random.default_rng(0))
    assert row["image"].shape == (32, 32, 4)
    assert row["target"].shape == (32, 32, 1)

    loader = BatchLoader(ds, batch_size=5, seed=3, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[-1]["image"].shape == (5, 32, 32, 4)
    assert batches[-1]["valid"].sum() == 2  # 12 = 5+5+2
    # determinism across re-iterations
    b1 = list(loader.epoch(1))[0]
    b2 = list(loader.epoch(1))[0]
    np.testing.assert_allclose(b1["image"], b2["image"])
    # different epochs shuffle differently
    b3 = list(loader.epoch(2))[0]
    assert not np.allclose(b1["image"], b3["image"])


def test_preprocess_chain(tmp_path):
    # build tiny source NIfTI dataset
    rng = np.random.default_rng(0)
    keys = ("F_Data1", "S_Data2")
    src = tmp_path / "src"
    for c in range(3):
        d = src / f"p{c}"
        d.mkdir(parents=True)
        for k in keys:
            vol = rng.uniform(0, 1000, size=(20, 20, 3)).astype(np.float32)
            write_nifti(d / f"{k}.nii.gz", Nifti(vol))
    dst = tmp_path / "h5"
    train, test = preprocess.preprocess_dataset(
        src, dst, keys=keys, target=16, test_frac=0.34, seed=1
    )
    assert len(train) + len(test) == 3
    assert (dst / "train_test.csv").exists()
    some_case = train[0]
    slices = h5store.case_slices(dst / "images_tr_16" / some_case)
    assert len(slices) == 3
    d = h5store.read_slice(slices[0], keys)
    assert d[keys[0]].shape == (16, 16)
    assert d[keys[0]].min() >= -1.0 - 1e-5 and d[keys[0]].max() <= 1.0 + 1e-5


def test_crop_brats():
    seg = np.zeros((20, 20, 10), np.int16)
    seg[8:12, 8:12, 3:7] = 1
    vols = {
        "t1": Nifti(np.random.default_rng(0).uniform(
            0, 100, (20, 20, 10)).astype(np.float32)),
        "seg": Nifti(seg),
    }
    out = preprocess.crop_brats(vols, inplane=16)
    assert out["t1"].data.shape == (16, 16, 4)
    assert out["seg"].data.max() == 1
    assert out["t1"].data.min() >= -1.0 and out["t1"].data.max() <= 1.0


def test_nnunet_export(tmp_path):
    from dsdiff_tpu.data.nnunet_export import export_nnunet_raw

    vols = {}
    for case in ("a", "b"):
        p = tmp_path / f"{case}.nii.gz"
        write_nifti(p, Nifti(np.zeros((4, 4, 2), np.float32)))
        vols[case] = p
    out = export_nnunet_raw(vols, tmp_path / "nnunet", "Task500_x")
    assert (out / "imagesTr" / "Task500_x_a_0000.nii.gz").exists()
    assert (out / "dataset.json").exists()


def test_unclip_adm_conditioning_path():
    """UNet 'crossattn-adm' capability: vector conditioning from a noise-
    augmented embedding (ImageEmbeddingConditionedLatentDiffusion parity,
    ddpm.py:1860-1930)."""
    import jax
    import jax.numpy as jnp
    from dsdiff_tpu.core.schedules import DiffusionSchedule
    from dsdiff_tpu.models import UNet, EmbeddingNoiseAugmentation, \
        conditioned_call

    sched = DiffusionSchedule.named("linear", 100)
    aug = EmbeddingNoiseAugmentation(sched, max_noise_level=50)
    emb = jnp.ones((2, 32))
    noisy_emb, level = aug(emb, jax.random.PRNGKey(0))

    m = UNet(in_channels=1, out_channels=1, model_channels=8,
             num_res_blocks=1, channel_mult=(1, 2),
             attention_resolutions=(2,), num_heads=2,
             use_spatial_transformer=True, context_dim=8,
             adm_in_channels=32)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 4, 8))
    params = m.init(jax.random.PRNGKey(0), x, t, ctx, noisy_emb)
    out = conditioned_call(
        lambda xx, tt, cc=None, y=None: m.apply(params, xx, tt, cc, y),
        "crossattn-adm", x, t,
        {"c_crossattn": [ctx], "c_adm": noisy_emb},
    )
    assert out.shape == (2, 16, 16, 1)
