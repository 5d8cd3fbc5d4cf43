"""Int8 inference quality delta at the flagship 256^2 operating point.

Restores a trained flagship-quality leg (scripts/flagship_quality.py) and
evaluates the SAME checkpoint's full val fold under DDIM-50 twice: the
bf16/f32 path and the int8 quantized path (ops/quant.py via
Trainer.set_sampler(int8=True)). The delta is the end-to-end cost of
post-training dynamic quantization accumulated over the 50-step chain —
the number that decides whether the int8 throughput win (PROFILE.md §10)
is usable.

No reference counterpart (the reference's inference is fp32/fp16 torch);
this is a TPU-native extension measured at the reference's headline
resolution.

Run on the real chip:
  python scripts/int8_quality.py [leg] [outdir]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from flagship_quality import ensure_data, eval_full_val, _make_trainer  # noqa: E402


def main():
    leg = sys.argv[1] if len(sys.argv) > 1 else "c128"
    outdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        "/tmp/dsdiff_flagship_quality")
    data_dir = ensure_data(outdir)
    tr = _make_trainer(leg, data_dir, outdir)
    res = {"leg": leg, "step": int(tr.state.step)}
    for mode in ("bf16", "int8"):
        tr.set_sampler(sampler="ddim", sample_steps=50, ddim_eta=0.0,
                       cached=False, int8=(mode == "int8"))
        res[mode] = eval_full_val(tr, f"{leg}/{mode}_ddim50")
    res["delta"] = {k: round(res["int8"][k] - res["bf16"][k], 4)
                    for k in ("ssim", "ms_ssim", "psnr", "mae")}
    tr.ckpt.close()
    print(json.dumps({"FINAL": res}), flush=True)
    (outdir / f"int8_quality_{leg}.json").write_text(
        json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
