"""Metric library tests: golden values and invariances."""
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.eval import metrics
from dsdiff_tpu.eval.assemble import VolumeAssembler, write_metric_report
from dsdiff_tpu.data.nifti import Nifti, write_nifti


RNG = np.random.default_rng(0)
VOL = RNG.uniform(-1, 1, size=(48, 48, 6)).astype(np.float32)


def test_scale12bit_stats():
    s = metrics.scale12bit(VOL)
    assert s.min() >= 1e-10 and s.max() <= 4095
    np.testing.assert_allclose(np.mean(s), 2048, atol=2)
    np.testing.assert_allclose(np.std(s), 400, rtol=0.02)


def test_identity_metrics():
    assert metrics.nrmse(VOL, VOL) == 0.0
    assert metrics.smape(VOL, VOL) == 0.0
    assert metrics.logac(VOL, VOL) == 0.0
    assert metrics.medsymac(VOL, VOL) == 0.0
    assert metrics.mae(VOL, VOL) == 0.0
    assert metrics.cc(VOL, VOL) == pytest.approx(1.0, abs=1e-6)
    assert metrics.dice(np.ones((4, 4)), np.ones((4, 4))) == 1.0


def test_psnr_golden():
    t = np.zeros((8, 8, 8)); t[0, 0, 0] = 1.0  # data_range 1
    p = t + 0.1
    # mse = 0.01 -> psnr = 20
    assert metrics.psnr(t, p) == pytest.approx(20.0, abs=1e-6)


def test_nrmse_golden():
    t = np.array([0.0, 2.0])
    p = np.array([1.0, 1.0])
    # rmse = 1, range = 2
    assert metrics.nrmse(t, p) == pytest.approx(0.5)


def test_ssim_properties():
    a = jnp.asarray(RNG.uniform(0, 1, (2, 32, 32)).astype(np.float32))
    s_same = metrics.ssim(a, a)
    np.testing.assert_allclose(np.asarray(s_same), 1.0, atol=1e-5)
    noisy = a + 0.5 * jnp.asarray(
        RNG.normal(size=a.shape).astype(np.float32))
    s_noisy = metrics.ssim(a, noisy)
    assert np.all(np.asarray(s_noisy) < 0.9)


def test_ms_ssim_properties():
    a = jnp.asarray(RNG.uniform(0, 1, (1, 192, 192)).astype(np.float32))
    v = metrics.ms_ssim(a, a)
    np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-4)
    shifted = jnp.roll(a, 9, axis=1)
    assert float(metrics.ms_ssim(a, shifted)[0]) < 0.999


def test_ms_ssim_volume_mask():
    vol = RNG.uniform(0, 1, size=(192, 192, 3)).astype(np.float64)
    v = metrics.ms_ssim_volume(vol, vol)
    assert v == pytest.approx(1.0, abs=1e-4)


def test_nmi_bounds():
    v = metrics.nmi(VOL, VOL)
    assert v == pytest.approx(1.0, abs=0.01)
    ind = RNG.uniform(-1, 1, VOL.shape)
    assert metrics.nmi(VOL, ind) < 0.5


def test_dice_golden():
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[1:3] = 1
    assert metrics.dice(a, b) == pytest.approx(0.5)


def test_assembler_and_report(tmp_path):
    asm = VolumeAssembler(tmp_path / "preds", task_id="T1")
    img = RNG.uniform(size=(10, 10)).astype(np.float32)
    for s in range(4):
        asm.add("caseA", s, img * s)
    template = Nifti(np.zeros((10, 10, 4), np.float32),
                     np.diag([2.0, 2.0, 5.0, 1.0]))
    tpath = tmp_path / "template.nii.gz"
    write_nifti(tpath, template)
    out = asm.write_case("caseA", tpath)
    assert out.name == "T1_caseA_pred.nii.gz"
    from dsdiff_tpu.data.nifti import read_nifti
    back = read_nifti(out)
    np.testing.assert_allclose(back.spacing, (2.0, 2.0, 5.0))
    np.testing.assert_allclose(back.data[:, :, 2], img * 2, rtol=1e-6)

    rows = [{"case": "a", "psnr": 20.0}, {"case": "b", "psnr": 30.0}]
    rp = write_metric_report(rows, tmp_path / "m.csv")
    text = rp.read_text()
    assert "mean,25.0" in text


def test_metric_report_xlsx(tmp_path):
    """The .xlsx report (reference get_metric.py:120-132 format) must be a
    well-formed workbook: validated with stdlib zip + SpreadsheetML parse
    (no openpyxl in-env)."""
    import xml.etree.ElementTree as ET
    import zipfile

    rows = [{"case": "a", "psnr": 20.0, "ssim": 0.5},
            {"case": "b", "psnr": 30.0, "ssim": 0.7}]
    rp = write_metric_report(rows, tmp_path / "m.xlsx")
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(rp) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    parsed = []
    for row in sheet.iter(f"{ns}row"):
        vals = []
        for c in row.iter(f"{ns}c"):
            if c.get("t") == "inlineStr":
                vals.append(c.find(f"{ns}is/{ns}t").text)
            else:
                vals.append(float(c.find(f"{ns}v").text))
        parsed.append(vals)
    assert parsed[0] == ["case", "psnr", "ssim"]
    assert parsed[1] == ["a", 20.0, 0.5]
    assert parsed[-1] == ["mean", 25.0, pytest.approx(0.6)]


def test_vifp_properties():
    from dsdiff_tpu.eval.fid import vifp

    img = RNG.uniform(0, 255, (64, 64))
    assert vifp(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = img + RNG.normal(0, 30, img.shape)
    v = vifp(img, noisy)
    assert 0.0 < v < 1.0
    # volume form
    vol = RNG.uniform(0, 255, (64, 64, 3))
    assert vifp(vol, vol) == pytest.approx(1.0, abs=1e-6)


def test_frechet_distance_golden():
    from dsdiff_tpu.eval.fid import FeatureStats, frechet_distance

    # identical Gaussians -> 0
    mu = np.zeros(4); cov = np.eye(4)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)
    # mean shift d in all dims -> ||d||^2
    mu2 = np.full(4, 2.0)
    assert frechet_distance(mu, cov, mu2, cov) == pytest.approx(16.0, abs=1e-5)
    # streaming stats match numpy
    X = RNG.normal(size=(500, 4))
    st = FeatureStats(4)
    st.update(X[:250]); st.update(X[250:])
    np.testing.assert_allclose(st.mean, X.mean(0), atol=1e-10)
    np.testing.assert_allclose(st.cov, np.cov(X.T), atol=1e-8)


@pytest.mark.slow
def test_fid_discriminates():
    from dsdiff_tpu.eval.fid import fid

    real = RNG.uniform(-1, 1, (24, 32, 32, 1)).astype(np.float32)
    same = real + RNG.normal(0, 0.01, real.shape).astype(np.float32)
    diff = RNG.normal(0, 1, real.shape).astype(np.float32).clip(-1, 1)
    f_same = fid(real, same)
    f_diff = fid(real, diff)
    assert f_same < f_diff


def _cwt_oracle(sig, widths):
    """Independent oracle for scipy.signal.cwt semantics (removed from
    scipy >= 1.15), written from the published definition: per width w,
    same-mode DIRECT convolution (np.convolve, not FFT — independent
    numerics from the fftconvolve implementation under test) with
    ricker(min(10*w, N), w), where ricker is the textbook Mexican hat
    A*(1-(x/a)^2)*exp(-(x/a)^2/2), A = 2/(sqrt(3a)*pi^(1/4))."""
    sig = np.asarray(sig, np.float64)
    out = np.empty((len(widths), sig.shape[0]), np.float64)
    for i, a in enumerate(widths):
        n = int(min(10 * a, sig.shape[0]))
        x = np.arange(n) - (n - 1.0) / 2.0
        xsq = (x / a) ** 2
        wav = (2.0 / (np.sqrt(3.0 * a) * np.pi ** 0.25)
               * (1.0 - xsq) * np.exp(-xsq / 2.0))
        out[i] = np.convolve(sig, wav, mode="same")
    return out


def test_cw_ssim_matches_cwt_oracle():
    """Our ricker-CWT reproduces scipy.signal.cwt semantics (the pyssim
    dependency, reference test_metrics.py:304-323) — checked against a
    direct-convolution oracle, and against real scipy.signal.cwt too when
    this scipy still ships it."""
    from dsdiff_tpu.eval.metrics import _cwt_ricker

    rng = np.random.default_rng(0)
    sig = rng.normal(size=200)
    widths = np.arange(1, 8)
    got = _cwt_ricker(sig, widths)
    np.testing.assert_allclose(got, _cwt_oracle(sig, widths),
                               rtol=1e-7, atol=1e-9)
    import scipy.signal as scipy_signal

    if hasattr(scipy_signal, "cwt"):
        ref = scipy_signal.cwt(sig, scipy_signal.ricker, widths)
        np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-9)


def test_cw_ssim_identity_and_degradation():
    from dsdiff_tpu.eval.metrics import cw_ssim_slice, cw_ssim_volume

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (24, 24))
    same = cw_ssim_slice(img, img)
    assert same > 0.999
    noisy = cw_ssim_slice(img, img + rng.normal(0, 60, img.shape))
    assert noisy < same
    vol = rng.uniform(0, 1, (16, 16, 3))
    v_same = cw_ssim_volume(vol, vol)
    v_noisy = cw_ssim_volume(vol, np.clip(vol + rng.normal(
        0, 0.5, vol.shape), 0, 1))
    assert v_same > 0.999 and v_noisy < v_same


def test_evaluate_volume_has_cw_ssim():
    from dsdiff_tpu.eval.metrics import evaluate_volume

    rng = np.random.default_rng(2)
    vol = rng.uniform(-1, 1, (16, 16, 2))
    row = evaluate_volume(vol, vol * 0.9, with_cw_ssim=True)
    assert "cw_ssim" in row and np.isfinite(row["cw_ssim"])


def test_fake_3d_perceptual():
    """fake-3D mode: 3D volumes scored via sliced 2D perceptual distance
    (perceptual_loss.py fake_3d_ratio); zero on identical volumes, positive
    otherwise, and slice subsampling works."""
    import jax

    from dsdiff_tpu.eval.perceptual import PerceptualLoss, fake_3d_distance

    pl = PerceptualLoss(seed=0)
    fn = pl.distance_fn()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8)) * 0.5
    y = x + 0.3 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    d0 = np.asarray(fake_3d_distance(fn, x, x))
    d1 = np.asarray(fake_3d_distance(fn, x, y))
    d_sub = np.asarray(fake_3d_distance(fn, x, y, ratio=0.5))
    np.testing.assert_allclose(d0, 0.0, atol=1e-6)
    assert (d1 > 0).all() and (d_sub > 0).all()
    assert d0.shape == (2,)
