"""Inference entry point: predict test slices -> NIfTI volumes -> metrics.

Mirrors inference/inference_2d_with_gaussian_main.py:26-110 (checkpoint
discovery, predict, metric report).
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", required=True)
    ap.add_argument("--model_config", default=None)
    ap.add_argument("--workdir", required=True,
                    help="training run dir containing checkpoint/")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--gt_root", default=None,
                    help="NIfTI ground-truth root for the metric report")
    ap.add_argument("--gt_name", default=None)
    ap.add_argument("--sampler", default=None,
                    help="override sampler (ddim|dpm++|ancestral)")
    ap.add_argument("--sample_steps", type=int, default=None)
    ap.add_argument("--int8", action="store_true",
                    help="quantized int8-MXU inference (ops/quant.py)")
    args = ap.parse_args(argv)

    from ..train import Trainer, load_run_config

    overrides = {}
    if args.sampler or args.sample_steps:
        ss = {}
        if args.sampler:
            ss["sampler"] = args.sampler
        if args.sample_steps:
            ss["sample_steps"] = args.sample_steps
        overrides["sampler_setting"] = ss
    cfg = load_run_config(args.config_file, args.model_config, overrides)
    trainer = Trainer(cfg, Path(args.workdir))
    trainer.state, trainer.sampler_state = trainer.ckpt.restore(
        trainer.state, trainer.sampler_state
    )
    if args.int8:
        trainer.set_sampler(int8=True)
    out_dir, rows = trainer.predict(
        out_dir=args.out_dir,
        template_root=cfg.get("filepath_img"),
        gt_root=args.gt_root or cfg.get("filepath_img"),
        gt_name=args.gt_name,
    )
    print(f"wrote predictions to {out_dir} ({len(rows)} cases scored)")


if __name__ == "__main__":
    main()
