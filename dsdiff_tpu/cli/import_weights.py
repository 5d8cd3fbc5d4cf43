"""dsdiff-import-weights: published torch checkpoint -> Orbax params.

The reference scatters its pretrained loads across call sites
(ldm/models/autoencoder.py:111-120 vae-ft-mse, loss_function/
perceptual_loss.py:21 LPIPS VGG16, MONAI RadImageNet ResNet50, torchmetrics
FID inception). This CLI centralizes them: read the torch file (safetensors
or zip-pickle, no torch needed), key-map onto the Flax module, print a
mapped/missing/unused report, and save the result as an Orbax checkpoint
that the trainers/metrics load directly.

    dsdiff-import-weights --kind sd_vae vae-ft-mse-840000.ckpt out_dir/
    dsdiff-import-weights --kind inception pt_inception-2015-12-05 out/
    kinds: sd_vae | vgg16 | lpips_lins | resnet50 | inception

Exit code 1 if any target leaf stayed unmapped (incomplete import).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _report(name, missing, unused, n_mapped, strict_missing=True):
    rep = {
        "kind": name,
        "mapped": n_mapped,
        "missing_target_leaves": sorted(missing),
        "unused_source_keys": sorted(unused),
    }
    print(json.dumps(rep, indent=2))
    return 1 if (strict_missing and missing) else 0


def _save(out_dir, tree):
    import orbax.checkpoint as ocp

    out_dir = Path(out_dir).absolute()
    out_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(out_dir / "params", tree, force=True)
    print(f"saved -> {out_dir / 'params'}")


def import_sd_vae(path, out_dir, image_size=256):
    import jax
    import jax.numpy as jnp

    from ..models import AutoencoderKL
    from ..utils import torch_io

    vae = AutoencoderKL(in_channels=3, out_channels=3)
    rng = jax.random.PRNGKey(0)
    target = jax.eval_shape(
        vae.init, rng, jnp.zeros((1, image_size, image_size, 3)), rng
    )
    target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), target)
    sd = torch_io.load_checkpoint(path)
    mapped = torch_io.map_sd_vae(sd)
    params, missing, unused = torch_io.assign(target, mapped)
    rc = _report("sd_vae", missing, unused, len(mapped) - len(unused))
    if rc == 0:
        _save(out_dir, params)
    return rc


def import_vgg16(path, out_dir):
    import jax
    import jax.numpy as jnp

    from ..eval.perceptual import _VGG16_LAYOUT, VGG16Features, map_vgg16
    from ..utils import torch_io

    sd = torch_io.load_checkpoint(path)
    mapped = map_vgg16(sd)
    net = VGG16Features()
    target = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), target)
    params, missing, unused = torch_io.assign(target, mapped, make_fit=False)
    # classifier.* heads are not part of the LPIPS trunk
    consumed = {f"features.{i}.{s}" for _, idxs in _VGG16_LAYOUT
                for i in idxs for s in ("weight", "bias")}
    src_unused = sorted(k for k in sd if k not in consumed
                        and not k.startswith("classifier."))
    rc = _report("vgg16", missing, src_unused, len(mapped))
    if rc == 0:
        _save(out_dir, params)
    return rc


def import_lpips_lins(path, out_dir):
    from ..eval.perceptual import map_lpips_lins
    from ..utils import torch_io

    sd = torch_io.load_checkpoint(path)
    lins = map_lpips_lins(sd)
    missing = [f"lin{i}" for i, v in enumerate(lins) if v is None]
    rc = _report("lpips_lins", missing, [], sum(v is not None for v in lins))
    if rc == 0:
        _save(out_dir, {f"lin{i}": v for i, v in enumerate(lins)})
    return rc


def import_resnet50(path, out_dir):
    import jax
    import jax.numpy as jnp

    from ..eval.perceptual import ResNet50Features, map_resnet50
    from ..utils import torch_io

    sd = torch_io.load_checkpoint(path)
    for pref in ("model.", "backbone.", "module."):
        if any(k.startswith(pref) for k in sd):
            sd = {k[len(pref):] if k.startswith(pref) else k: v
                  for k, v in sd.items()}
    mapped = map_resnet50(sd)
    net = ResNet50Features()
    target = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    target = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), target)
    params, missing, unused = torch_io.assign(target, mapped, make_fit=False)
    rc = _report("resnet50", missing, unused, len(mapped))
    if rc == 0:
        _save(out_dir, params)
    return rc


def import_inception(path, out_dir, variant="pt_fid"):
    from ..models.inception import load_inception

    net, variables = load_inception(path, variant=variant)
    rc = _report("inception", [], [], sum(
        x.size for x in __import__("jax").tree.leaves(variables)))
    _save(out_dir, variables)
    return rc


KINDS = {
    "sd_vae": import_sd_vae,
    "vgg16": import_vgg16,
    "lpips_lins": import_lpips_lins,
    "resnet50": import_resnet50,
    "inception": import_inception,
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="dsdiff-import-weights",
                                 description=__doc__)
    ap.add_argument("--kind", required=True, choices=sorted(KINDS))
    ap.add_argument("checkpoint", help="torch .ckpt/.pth/.safetensors file")
    ap.add_argument("out_dir", help="Orbax output directory")
    args = ap.parse_args(argv)
    return KINDS[args.kind](args.checkpoint, args.out_dir)


if __name__ == "__main__":
    sys.exit(main())
