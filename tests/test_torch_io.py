"""Torch-checkpoint reader + key-mapping tests (VERDICT round-1 item 3).

Writes REAL torch-format files (torch is baked into the image) and reads
them back with the torch-free readers; checks layout conversion numerically
against torch.nn.functional; checks the SD-VAE key map covers every
AutoencoderKL parameter; checks LPIPS constructs for real from a local
VGG16-format file.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dsdiff_tpu.utils import torch_io as tio  # noqa: E402


def test_zip_pickle_roundtrip(tmp_path):
    sd = {
        "conv.weight": torch.randn(8, 3, 3, 3),
        "lin.weight": torch.randn(5, 7),
        "norm.weight": torch.randn(6),
        "half.weight": torch.randn(4, 4).half(),
        "bf.weight": torch.randn(2, 2).bfloat16(),
        "noncontig": torch.randn(6, 8).t().contiguous().t(),
        "idx": torch.arange(5),
    }
    p = tmp_path / "ckpt.pt"
    torch.save({"state_dict": sd, "epoch": 3}, p)
    out = tio.load_checkpoint(p)
    assert "epoch" not in out  # non-array metadata dropped
    for k, v in sd.items():
        ref = v.float().numpy() if v.dtype in (
            torch.float16, torch.bfloat16) else v.numpy()
        np.testing.assert_allclose(out[k], ref, rtol=1e-6)


def test_safetensors_roundtrip(tmp_path):
    st = pytest.importorskip("safetensors.torch")
    sd = {"a.weight": torch.randn(3, 4), "b.bias": torch.randn(4).half()}
    p = tmp_path / "w.safetensors"
    st.save_file(sd, str(p))
    out = tio.load_checkpoint(p)
    np.testing.assert_allclose(out["a.weight"], sd["a.weight"].numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(out["b.bias"], sd["b.bias"].float().numpy(),
                               rtol=1e-3)


def test_conv_layout_matches_torch():
    """Mapped conv kernel in flax == torch.nn.functional.conv2d."""
    import flax.linen as nn

    w = torch.randn(5, 3, 3, 3)
    b = torch.randn(5)
    x = torch.randn(2, 3, 8, 8)
    ref = torch.nn.functional.conv2d(x, w, b, padding=1).numpy()

    leaf, kernel = tio.to_flax("layer.weight", w.numpy())
    assert leaf == "kernel" and kernel.shape == (3, 3, 3, 5)
    conv = nn.Conv(5, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(kernel),
                         "bias": jnp.asarray(b.numpy())}}
    got = conv.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_dense_and_groupnorm_match_torch():
    import flax.linen as nn

    w = torch.randn(6, 4)
    b = torch.randn(6)
    x = torch.randn(3, 4)
    ref = torch.nn.functional.linear(x, w, b).numpy()
    leaf, kernel = tio.to_flax("fc.weight", w.numpy())
    dense = nn.Dense(6)
    got = dense.apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": jnp.asarray(b.numpy())}},
        jnp.asarray(x.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)

    from dsdiff_tpu.models.layers import GroupNorm32

    C = 16
    g = torch.randn(C)
    beta = torch.randn(C)
    xt = torch.randn(2, C, 6, 6)
    ref = torch.nn.functional.group_norm(xt, 16 if C >= 32 else C // 1, g,
                                         beta)
    # GroupNorm32 uses min(32, C) groups
    ref = torch.nn.functional.group_norm(xt, min(32, C), g, beta).numpy()
    gn = GroupNorm32()
    got = gn.apply(
        {"params": {"norm": {"scale": jnp.asarray(g.numpy()),
                             "bias": jnp.asarray(beta.numpy())}}},
        jnp.asarray(xt.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def _res_keys(prefix, cin, cout):
    sd = {
        f"{prefix}.norm1.weight": torch.randn(cin),
        f"{prefix}.norm1.bias": torch.randn(cin),
        f"{prefix}.conv1.weight": torch.randn(cout, cin, 3, 3),
        f"{prefix}.conv1.bias": torch.randn(cout),
        f"{prefix}.norm2.weight": torch.randn(cout),
        f"{prefix}.norm2.bias": torch.randn(cout),
        f"{prefix}.conv2.weight": torch.randn(cout, cout, 3, 3),
        f"{prefix}.conv2.bias": torch.randn(cout),
    }
    if cin != cout:
        sd[f"{prefix}.nin_shortcut.weight"] = torch.randn(cout, cin, 1, 1)
        sd[f"{prefix}.nin_shortcut.bias"] = torch.randn(cout)
    return sd


def _attn_keys(prefix, c):
    sd = {f"{prefix}.norm.weight": torch.randn(c),
          f"{prefix}.norm.bias": torch.randn(c)}
    for part in ("q", "k", "v", "proj_out"):
        sd[f"{prefix}.{part}.weight"] = torch.randn(c, c, 1, 1)
        sd[f"{prefix}.{part}.bias"] = torch.randn(c)
    return sd


def _sd_vae_state_dict(ch=8, z=2, embed=2):
    """CompVis-named VAE state_dict for ch_mult=(1,2), num_res_blocks=1."""
    c2 = 2 * ch
    sd = {
        "encoder.conv_in.weight": torch.randn(ch, 1, 3, 3),
        "encoder.conv_in.bias": torch.randn(ch),
        "encoder.norm_out.weight": torch.randn(c2),
        "encoder.norm_out.bias": torch.randn(c2),
        "encoder.conv_out.weight": torch.randn(2 * z, c2, 3, 3),
        "encoder.conv_out.bias": torch.randn(2 * z),
        "encoder.down.0.downsample.conv.weight": torch.randn(ch, ch, 3, 3),
        "encoder.down.0.downsample.conv.bias": torch.randn(ch),
        "quant_conv.weight": torch.randn(2 * embed, 2 * z, 1, 1),
        "quant_conv.bias": torch.randn(2 * embed),
        "post_quant_conv.weight": torch.randn(z, embed, 1, 1),
        "post_quant_conv.bias": torch.randn(z),
        "decoder.conv_in.weight": torch.randn(c2, z, 3, 3),
        "decoder.conv_in.bias": torch.randn(c2),
        "decoder.norm_out.weight": torch.randn(ch),
        "decoder.norm_out.bias": torch.randn(ch),
        "decoder.conv_out.weight": torch.randn(1, ch, 3, 3),
        "decoder.conv_out.bias": torch.randn(1),
        "decoder.up.1.upsample.conv.weight": torch.randn(c2, c2, 3, 3),
        "decoder.up.1.upsample.conv.bias": torch.randn(c2),
    }
    sd.update(_res_keys("encoder.down.0.block.0", ch, ch))
    sd.update(_res_keys("encoder.down.1.block.0", ch, c2))
    sd.update(_res_keys("encoder.mid.block_1", c2, c2))
    sd.update(_res_keys("encoder.mid.block_2", c2, c2))
    sd.update(_attn_keys("encoder.mid.attn_1", c2))
    sd.update(_res_keys("decoder.mid.block_1", c2, c2))
    sd.update(_res_keys("decoder.mid.block_2", c2, c2))
    sd.update(_attn_keys("decoder.mid.attn_1", c2))
    sd.update(_res_keys("decoder.up.1.block.0", c2, c2))
    sd.update(_res_keys("decoder.up.1.block.1", c2, c2))
    sd.update(_res_keys("decoder.up.0.block.0", c2, ch))
    sd.update(_res_keys("decoder.up.0.block.1", ch, ch))
    return sd


def test_sd_vae_mapping_complete(tmp_path):
    """Every AutoencoderKL parameter is filled from a CompVis-named VAE
    checkpoint (vae-ft-mse init capability, autoencoder.py:111-120), and the
    loaded weights change the model output."""
    from dsdiff_tpu.models import AutoencoderKL

    sd = _sd_vae_state_dict()
    # full-SD style prefix must be stripped
    p = tmp_path / "vae.ckpt"
    torch.save(
        {"state_dict": {f"first_stage_model.{k}": v for k, v in sd.items()}},
        p,
    )
    vae = AutoencoderKL(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=2, embed_dim=2)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 32, 32, 1))
    params = vae.init(rng, x, rng)
    loaded, missing, unused = tio.load_sd_vae(p, params)
    assert missing == [], missing[:10]
    assert unused == [], unused[:10]
    fresh_out, _ = vae.apply(params, x, rng)
    load_out, _ = vae.apply(loaded, x, rng)
    assert not np.allclose(np.asarray(fresh_out), np.asarray(load_out))
    # make_it_fit shape surgery: a 3-channel SD conv_in onto 1-channel model
    sd2 = dict(sd)
    sd2["encoder.conv_in.weight"] = torch.randn(8, 3, 3, 3)
    p2 = tmp_path / "vae3.pt"
    torch.save(sd2, p2)
    loaded2, missing2, _ = tio.load_sd_vae(p2, params)
    assert missing2 == []


def test_vgg16_lpips_real(tmp_path):
    """LPIPS constructs for real from a local torchvision-format VGG16 file
    (+ lpips lin heads), is zero on identical inputs and positive otherwise
    (loss_function/perceptual_loss.py:21 / contperceptual.py:18)."""
    from dsdiff_tpu.eval.perceptual import _VGG16_LAYOUT, PerceptualLoss

    sd = {}
    cin = 3
    for width, idxs in _VGG16_LAYOUT:
        for i in idxs:
            sd[f"features.{i}.weight"] = torch.randn(width, cin, 3, 3) * 0.1
            sd[f"features.{i}.bias"] = torch.randn(width) * 0.1
            cin = width
    widths = [w for w, _ in _VGG16_LAYOUT]
    for k, w in enumerate(widths):
        sd[f"lin{k}.model.1.weight"] = torch.rand(1, w, 1, 1)
    p = tmp_path / "vgg.pth"
    torch.save(sd, p)

    pl = PerceptualLoss(weights_path=str(p))
    assert pl.is_real_lpips
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 32, 32, 1)) * 0.5
    y = x + 0.2 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    d_same = np.asarray(pl(x, x))
    d_diff = np.asarray(pl(x, y))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()
    # absent weights -> documented random-feature proxy
    proxy = PerceptualLoss(seed=0)
    assert not proxy.is_real_lpips
    assert (np.asarray(proxy(x, y)) > 0).all()


def test_basic_conv2d_matches_torch():
    """BasicConv2d (conv + BN eps=1e-3 + relu) == torch functional chain."""
    from dsdiff_tpu.models.inception import BasicConv2d

    w = torch.randn(6, 3, 3, 3) * 0.2
    gamma, beta = torch.rand(6) + 0.5, torch.randn(6) * 0.1
    mean, var = torch.randn(6) * 0.1, torch.rand(6) + 0.5
    x = torch.randn(2, 3, 9, 9)
    ref = torch.nn.functional.conv2d(x, w, None, stride=2)
    ref = torch.nn.functional.batch_norm(ref, mean, var, gamma, beta,
                                         eps=1e-3)
    ref = torch.relu(ref).numpy()

    mod = BasicConv2d(6, (3, 3), strides=(2, 2))
    variables = {
        "params": {"conv": {"kernel": jnp.asarray(
            w.numpy().transpose(2, 3, 1, 0))},
            "bn": {"scale": jnp.asarray(gamma.numpy()),
                   "bias": jnp.asarray(beta.numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(mean.numpy()),
                               "var": jnp.asarray(var.numpy())}},
    }
    got = mod.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_inception_fid_extractor(tmp_path):
    """A torchvision-named inception checkpoint loads completely and yields
    2048-d pool3 features; FID(x, x)=0 and FID(x, y)>0 through it."""
    from dsdiff_tpu.eval.fid import fid, make_inception_extractor
    from dsdiff_tpu.models.inception import InceptionV3

    net = InceptionV3()
    rng = jax.random.PRNGKey(0)
    variables = net.init(rng, jnp.zeros((1, 299, 299, 3)))
    # invert the layout map to emit torchvision-named weights
    sd = {}

    def walk(tree, col, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, col, prefix + [k])
                continue
            path = ".".join(prefix)
            arr = np.asarray(v)
            if k == "kernel":
                sd[f"{path}.weight"] = torch.tensor(
                    arr.transpose(3, 2, 0, 1)) * 0.3
            elif col == "params" and k == "scale":
                sd[f"{path}.weight"] = torch.tensor(arr)
            elif col == "params" and k == "bias":
                sd[f"{path}.bias"] = torch.tensor(arr)
            elif k == "mean":
                sd[f"{path}.running_mean"] = torch.tensor(arr)
            elif k == "var":
                sd[f"{path}.running_var"] = torch.tensor(arr)

    walk(variables["params"], "params", [])
    walk(variables["batch_stats"], "batch_stats", [])
    p = tmp_path / "inception.pth"
    torch.save(sd, p)

    extractor = make_inception_extractor(p)
    x = np.random.default_rng(0).normal(size=(4, 64, 64, 1)).astype(
        np.float32).clip(-1, 1)
    feats = extractor(x[:2])
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
    # with only 4 samples the 2048x2048 covariances are rank-deficient, so
    # sqrtm noise keeps FID(x,x) off exact zero — compare relatively
    y = np.clip(x + 0.5, -1, 1)
    fid_same = fid(x, x, extractor=extractor, batch=2)
    fid_diff = fid(x, y, extractor=extractor, batch=2)
    assert fid_same < 0.2 * fid_diff, (fid_same, fid_diff)
    np.testing.assert_allclose(extractor(x[:2]), feats, rtol=1e-5)


def _resnet50_state_dict(rng):
    """Random torchvision-ResNet50-shaped state dict (torchvision absent in
    this image; the layout is fixed by the architecture)."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    sd["conv1.weight"] = torch.randn(64, 3, 7, 7) * 0.05
    bn("bn1", 64)
    inplanes = 64
    for li, (n_blocks, mid) in enumerate(zip((3, 4, 6, 3),
                                             (64, 128, 256, 512))):
        for bi in range(n_blocks):
            t = f"layer{li + 1}.{bi}"
            sd[f"{t}.conv1.weight"] = torch.randn(mid, inplanes, 1, 1) * 0.05
            bn(f"{t}.bn1", mid)
            sd[f"{t}.conv2.weight"] = torch.randn(mid, mid, 3, 3) * 0.05
            bn(f"{t}.bn2", mid)
            sd[f"{t}.conv3.weight"] = torch.randn(mid * 4, mid, 1, 1) * 0.05
            bn(f"{t}.bn3", mid * 4)
            if bi == 0:
                sd[f"{t}.downsample.0.weight"] = \
                    torch.randn(mid * 4, inplanes, 1, 1) * 0.05
                bn(f"{t}.downsample.1", mid * 4)
            inplanes = mid * 4
    return sd


def test_affine_bn_matches_torch_eval_batchnorm():
    """_fold_bn + _AffineBN == torch BatchNorm2d in eval mode."""
    from dsdiff_tpu.eval.perceptual import _AffineBN, _fold_bn

    c = 16
    torch.manual_seed(0)
    bn = torch.nn.BatchNorm2d(c)
    bn.weight.data = torch.rand(c) + 0.5
    bn.bias.data = torch.randn(c) * 0.1
    bn.running_mean.data = torch.randn(c) * 0.2
    bn.running_var.data = torch.rand(c) + 0.5
    bn.eval()
    x = torch.randn(2, c, 8, 8)
    want = bn(x).detach().numpy().transpose(0, 2, 3, 1)

    sd = {"b.weight": bn.weight.data, "b.bias": bn.bias.data,
          "b.running_mean": bn.running_mean.data,
          "b.running_var": bn.running_var.data}
    s, b = _fold_bn(sd, "b")
    m = _AffineBN(c)
    params = {"params": {"scale": jnp.asarray(s), "bias": jnp.asarray(b)}}
    got = np.asarray(m.apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_radimagenet_resnet50_perceptual(tmp_path):
    """The RadImageNet/ResNet50 perceptual backend constructs from a local
    torchvision-format checkpoint (perceptual_loss.py network_type
    'radimagenet_resnet50'): complete key map, zero on identical inputs,
    positive and jit-stable otherwise."""
    from dsdiff_tpu.eval.perceptual import PerceptualLoss

    torch.manual_seed(1)
    sd = _resnet50_state_dict(None)
    p = tmp_path / "radimagenet_resnet50.pth"
    torch.save(sd, p)
    pl = PerceptualLoss(weights_path=str(p), network_type="radimagenet")
    assert pl.is_real_lpips
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 1)) * 0.5
    y = x + 0.3 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    d_same = np.asarray(pl(x, x))
    d_diff = np.asarray(pl(x, y))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    assert (d_diff > 0).all()
