"""3D / rgb / wholebody transform presets (VERDICT r2 item 9;
training_project/training_transform.py:106,298,358,487)."""
import numpy as np

from dsdiff_tpu.data import transforms as T


def _sample_3d(d=10, h=20, w=18):
    rng = np.random.default_rng(0)
    return {
        "A": rng.normal(size=(d, h, w)).astype(np.float32),
        "B": rng.normal(size=(d, h, w)).astype(np.float32),
        "t1ce": rng.normal(size=(d, h, w)).astype(np.float32),
        "mask": (rng.random((d, h, w)) > 0.5).astype(np.float32),
    }


def test_divisible_pad_3d():
    x = np.zeros((3, 10, 20, 18), np.float32)
    y = T.divisible_pad(x, k=16, spatial_dims=3)
    assert y.shape == (3, 16, 32, 32)
    # centered split
    assert np.all(y[:, 3:13, 6:26, 7:25] == x)


def test_3d_train_preset_contract():
    rng = np.random.default_rng(1)
    apply = T.get_3d_train_transform(["A", "B"], random_prob=1.0)
    out = apply(_sample_3d(), rng)
    assert set(out) == {"image", "t1ce", "mask"}
    assert out["image"].shape == (2, 16, 32, 32)  # concat + /16 pad
    assert out["t1ce"].shape == (16, 32, 32)
    assert np.isfinite(out["image"]).all()


def test_3d_train_preset_joint_geometry():
    """Rotation/flip must be applied jointly: transforming identical inputs
    must give identical outputs across keys."""
    rng = np.random.default_rng(2)
    base = np.random.default_rng(3).normal(size=(12, 24, 24)) \
        .astype(np.float32)
    sample = {"A": base, "B": base.copy(), "t1ce": base.copy()}
    out = T.get_3d_train_transform(["A", "B"], random_prob=1.0)(sample, rng)
    np.testing.assert_allclose(out["image"][0], out["image"][1], atol=1e-6)
    np.testing.assert_allclose(out["image"][0], out["t1ce"], atol=1e-6)


def test_rotate_3d_identity_at_prob_zero_and_changes_volume():
    import scipy.ndimage as ndi

    rng = np.random.default_rng(4)
    # smooth volume: trilinear interpolation preserves its statistics
    # (white noise would be low-pass filtered by any resampling)
    v = ndi.gaussian_filter(
        np.random.default_rng(5).normal(size=(16, 24, 24)), 2.0
    ).astype(np.float32)
    (same,) = T.random_rotate_3d([v], np.random.default_rng(6), prob=0.0)
    np.testing.assert_array_equal(same, v)
    (rot,) = T.random_rotate_3d([v], rng, prob=1.0)
    assert rot.shape == v.shape
    assert not np.allclose(rot, v)
    # energy roughly preserved (reflection border, interpolation)
    assert abs(rot.std() - v.std()) / v.std() < 0.25


def test_3d_val_preset_pads_only():
    apply = T.get_3d_val_transform(["A", "B"])
    s = _sample_3d()
    out = apply(s)
    assert out["image"].shape == (2, 16, 32, 32)
    # deterministic: center crop of the padded image equals the input
    np.testing.assert_allclose(out["image"][0, 3:13, 6:26, 7:25], s["A"])


def test_rgb_presets():
    rng = np.random.default_rng(7)
    h, w = 30, 40
    s = {"A": np.random.default_rng(8).normal(size=(h, w)).astype(np.float32),
         "t1ce": np.zeros((h, w), np.float32)}
    out = T.get_2d_rgb_train_transform(["A"], random_prob=1.0)(s, rng)
    assert out["image"].shape == (3, 32, 64)  # repeat 3 + /32 pad
    assert out["t1ce"].shape == (3, 32, 64)
    val = T.get_2d_rgb_val_transform(["A"])(s)
    assert val["image"].shape == (3, 32, 64)
    # channel repeat: all three channels identical pre-augment
    np.testing.assert_allclose(val["image"][0], val["image"][2])


def test_wholebody_preset_no_padding():
    s = {"A": np.zeros((7, 33, 31), np.float32),
         "B": np.ones((7, 33, 31), np.float32),
         "mask": np.zeros((7, 33, 31), np.float32)}
    out = T.get_wholebody_test_transform(["A", "B"])(s)
    assert out["image"].shape == (2, 7, 33, 31)  # native size, no pad
    assert out["mask"].shape == (7, 33, 31)
