"""De-circularized weight-import tests (VERDICT r2 item 3).

Round 2's torch_io tests wrote synthetic checkpoints with the same layout
assumptions the mappers encode — circular. Here the source of truth is the
vendored inventories (dsdiff_tpu/utils/inventories/*.json): the literal
key->shape layouts of the published weight files (CompVis vae-ft-mse first
stage, torchvision VGG16/ResNet50, pt-FID inception, lpips vgg.pth heads),
generated independently of the mapper code
(scripts/gen_weight_inventories.py). Each test asserts the mapper

  1. fills 100% of the Flax target (missing == []), and
  2. consumes 100% of the published key list (minus a documented ignore
     set: counters, classifier heads the feature trunks don't use).

File-level tests serialize the fake state_dict with REAL ``torch.save``
(torch is in the image) — validating the no-torch zip-pickle reader against
torch's actual serialization, not our own writer.
"""
import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsdiff_tpu.utils.inventories import (
    INVENTORIES, fake_state_dict, load_inventory,
)
from dsdiff_tpu.utils import torch_io


def _target_of(module, *init_args):
    t = jax.eval_shape(module.init, jax.random.PRNGKey(0), *init_args)
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), t)


def test_inventories_load():
    for name in INVENTORIES:
        inv = load_inventory(name)
        assert len(inv) > 0
    assert len(load_inventory("sd_vae_ft_mse")) == 248
    assert len(load_inventory("torchvision_vgg16")) == 32
    assert len(load_inventory("torchvision_resnet50")) == 320
    assert len(load_inventory("inception_v3_fid")) == 580


def test_sd_vae_mapper_against_published_layout():
    from dsdiff_tpu.models import AutoencoderKL

    sd = fake_state_dict("sd_vae_ft_mse")
    mapped = torch_io.map_sd_vae(sd)
    # every published key consumed
    unread = set(sd) - sd.read
    assert not unread, sorted(unread)[:8]
    # every target leaf filled, nothing mapped to a nonexistent leaf
    vae = AutoencoderKL(in_channels=3, out_channels=3)
    rng = jax.random.PRNGKey(0)
    target = _target_of(vae, jnp.zeros((1, 64, 64, 3)), rng)
    params, missing, unused = torch_io.assign(target, mapped, make_fit=False)
    assert missing == [], missing[:8]
    assert unused == [], unused[:8]
    # values actually land (spot-check a conv kernel transpose)
    w = np.asarray(sd["encoder.conv_in.weight"])
    got = params["params"]["encoder"]["conv_in"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), w.transpose(2, 3, 1, 0))


def test_vgg16_mapper_against_published_layout():
    from dsdiff_tpu.eval.perceptual import VGG16Features, map_vgg16

    sd = fake_state_dict("torchvision_vgg16")
    mapped = map_vgg16(sd)
    # trunk keys all consumed; classifier heads are the documented ignore
    unread = {k for k in set(sd) - sd.read
              if not k.startswith("classifier.")}
    assert not unread, sorted(unread)
    target = _target_of(VGG16Features(), jnp.zeros((1, 64, 64, 3)))
    params, missing, unused = torch_io.assign(target, mapped, make_fit=False)
    assert missing == [] and unused == []


def test_lpips_lins_mapper_against_published_layout():
    from dsdiff_tpu.eval.perceptual import map_lpips_lins

    sd = fake_state_dict("lpips_vgg_lins")
    lins = map_lpips_lins(sd)
    assert all(v is not None for v in lins)
    assert [v.shape[0] for v in lins] == [64, 128, 256, 512, 512]
    assert set(sd) == sd.read


def test_resnet50_mapper_against_published_layout():
    from dsdiff_tpu.eval.perceptual import ResNet50Features, map_resnet50

    sd = fake_state_dict("torchvision_resnet50")
    mapped = map_resnet50(sd)
    ignore = {k for k in sd
              if k.endswith("num_batches_tracked") or k.startswith("fc.")}
    unread = set(sd) - sd.read - ignore
    assert not unread, sorted(unread)[:8]
    target = _target_of(ResNet50Features(), jnp.zeros((1, 64, 64, 3)))
    params, missing, unused = torch_io.assign(target, mapped, make_fit=False)
    assert missing == [], missing[:8]
    assert unused == [], unused[:8]
    # BN folding correctness at conv1/bn1
    g = np.asarray(sd["bn1.weight"])
    v = np.asarray(sd["bn1.running_var"])
    scale = np.asarray(params["params"]["bn1"]["scale"])
    np.testing.assert_allclose(scale, g / np.sqrt(v + 1e-5), rtol=1e-5)


def test_inception_mapper_against_published_layout():
    from dsdiff_tpu.models.inception import InceptionV3, map_inception

    sd = fake_state_dict("inception_v3_fid")
    mapped = map_inception(sd)
    net = InceptionV3(variant="pt_fid")
    target = _target_of(net, jnp.zeros((1, 299, 299, 3)))
    variables, missing, unused = torch_io.assign(target, mapped,
                                                 make_fit=False)
    assert missing == [], missing[:8]
    # the FID feature trunk has no aux/fc heads; everything unused must be
    # exactly those (plus nothing else)
    bad = [k for k in unused
           if not (k.startswith("params/AuxLogits") or
                   k.startswith("batch_stats/AuxLogits") or
                   k.startswith("params/fc"))]
    assert bad == [], bad[:8]
    # every published trunk key represented in the mapped dict
    for k in load_inventory("inception_v3_fid"):
        if (k.startswith("AuxLogits") or k.startswith("fc.")
                or k.endswith("num_batches_tracked")):
            continue
        parts = k.split(".")
        if parts[-1] in ("weight", "bias") and parts[-2] == "conv":
            flax = "params/" + "/".join(parts[:-1]) + "/kernel"
        elif parts[-2] == "bn":
            col = ("params" if parts[-1] in ("weight", "bias")
                   else "batch_stats")
            leaf = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}[parts[-1]]
            flax = f"{col}/" + "/".join(parts[:-1]) + f"/{leaf}"
        else:
            continue
        assert flax in mapped, (k, flax)


@pytest.mark.parametrize("fmt", ["torch_save", "safetensors"])
def test_reader_against_real_torch_serialization(tmp_path, fmt):
    """load_checkpoint must read files written by torch itself."""
    torch = pytest.importorskip("torch")
    sd_np = fake_state_dict("lpips_vgg_lins")
    path = tmp_path / "w.pth"
    if fmt == "torch_save":
        torch.save({k: torch.from_numpy(np.asarray(v))
                    for k, v in sd_np.items()}, path)
    else:
        # torch's own safetensors writer if available, else skip
        st = pytest.importorskip("safetensors.torch")
        st.save_file({k: torch.from_numpy(np.asarray(v).copy())
                      for k, v in sd_np.items()}, str(path))
    out = torch_io.load_checkpoint(path)
    assert set(out) == set(sd_np)
    for k in out:
        np.testing.assert_allclose(out[k], np.asarray(sd_np[k]), rtol=1e-6)


def test_import_weights_cli_sd_vae(tmp_path):
    """dsdiff-import-weights end-to-end: real torch.save file -> report ->
    Orbax params on disk."""
    torch = pytest.importorskip("torch")
    sd_np = fake_state_dict("sd_vae_ft_mse")
    ckpt = tmp_path / "vae-ft-mse.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd_np.items()}}, ckpt)
    out_dir = tmp_path / "imported"
    proc = subprocess.run(
        [sys.executable, "-m", "dsdiff_tpu.cli.import_weights",
         "--kind", "sd_vae", str(ckpt), str(out_dir)],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.loads(proc.stdout[: proc.stdout.index("saved ->")])
    assert rep["missing_target_leaves"] == []
    assert rep["unused_source_keys"] == []
    assert (out_dir / "params").exists()
