"""CLI entry point tests (argument wiring + full preprocess->evaluate flow)."""
import numpy as np
import pytest

from dsdiff_tpu.data.nifti import Nifti, write_nifti


def test_preprocess_cli(tmp_path, capsys):
    from dsdiff_tpu.cli.preprocess import main

    rng = np.random.default_rng(0)
    for c in range(3):
        d = tmp_path / "src" / f"p{c}"
        d.mkdir(parents=True)
        for k in ("A", "B"):
            write_nifti(
                d / f"{k}.nii.gz",
                Nifti(rng.uniform(0, 500, (20, 20, 3)).astype(np.float32)),
            )
    main([
        "--src", str(tmp_path / "src"), "--dst", str(tmp_path / "dst"),
        "--keys", "A", "B", "--target", "16", "--test_frac", "0.34",
    ])
    out = capsys.readouterr().out
    assert "train" in out
    assert (tmp_path / "dst" / "train_test.csv").exists()
    tr_cases = list((tmp_path / "dst" / "images_tr_16").iterdir())
    ts_cases = list((tmp_path / "dst" / "images_ts_16").iterdir())
    assert len(tr_cases) + len(ts_cases) == 3


def test_evaluate_cli(tmp_path, capsys):
    from dsdiff_tpu.cli.evaluate import main

    rng = np.random.default_rng(0)
    gt_root = tmp_path / "gt" / "caseA"
    gt_root.mkdir(parents=True)
    vol = rng.uniform(-1, 1, (48, 48, 4)).astype(np.float32)
    write_nifti(gt_root / "S_Data2.nii.gz", Nifti(vol))
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    write_nifti(pred_dir / "T1_caseA_pred.nii.gz",
                Nifti((vol * 0.95).astype(np.float32)))
    main(["--pred_dir", str(pred_dir), "--gt_root", str(tmp_path / "gt")])
    out = capsys.readouterr().out
    assert "caseA" in out and "psnr" in out
    assert (pred_dir / "metrics.csv").exists()


def test_train_cli_missing_config():
    from dsdiff_tpu.cli.train import main

    with pytest.raises(SystemExit):
        main([])  # --config_file required
