"""Offline metric report: predictions dir vs ground-truth NIfTI root.

Mirrors inference/get_metric.py:16-132 (per-case rows + mean -> report file).
"""
from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--gt_root", required=True)
    ap.add_argument("--gt_name", default="S_Data2.nii.gz")
    ap.add_argument("--report", default=None)
    args = ap.parse_args(argv)

    from ..eval.assemble import evaluate_predictions

    report = args.report or f"{args.pred_dir}/metrics.csv"
    rows = evaluate_predictions(
        args.pred_dir, args.gt_root, args.gt_name, report_path=report
    )
    for r in rows:
        print(r)
    print(f"report: {report} ({len(rows)} cases)")


if __name__ == "__main__":
    main()
