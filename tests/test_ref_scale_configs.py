"""Reference-scale configs (VERDICT r2 item 6): dsdiff_ldm320 matches the
v2-1-cddpm-ds-disc.yaml operating point, dsdiff_thesis160 the thesis's
160-channel/≈24M-backbone config — both must load through the config system
and produce buildable models (shape-level only; no giant allocs)."""
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from dsdiff_tpu.models import build_model
from dsdiff_tpu.train import load_run_config

CONFIGS = Path(__file__).parent.parent / "configs"


def _model_from(cfg, in_ch=4):
    p = dict(cfg.get_path("unet_config.params"))
    learn_sigma = bool(cfg.get("learn_sigma", False))
    return build_model(
        "dsunet", in_channels=in_ch,
        out_channels=2 if learn_sigma else 1,
        dtype=jnp.bfloat16, **p,
    )


@pytest.mark.parametrize("name,width,t_steps,hw", [
    ("dsdiff_ldm320.yaml", 320, 2000, 320),
    ("dsdiff_thesis160.yaml", 160, 1000, 256),
    ("dsdiff_flagship128.yaml", 128, 1000, 256),
])
def test_ref_scale_config_loads_and_builds(name, width, t_steps, hw):
    cfg = load_run_config(CONFIGS / "train_config.yaml", CONFIGS / name)
    assert int(cfg.get_path("unet_config.params.model_channels")) == width
    assert int(cfg.get("diffusion_steps")) == t_steps
    assert int(cfg.get("image_size")) == hw
    model = _model_from(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, hw, hw, 4), jnp.float32), jnp.zeros((1,), jnp.float32),
    )
    n_par = sum(s.size for s in jax.tree.leaves(shapes))
    # 4-stream DSUNet: 93.6M at C=96 scales ~C² -> ~1.04B at C=320,
    # ~260M at C=160 (the thesis's "24M" table is not consistent with its
    # own published module config; we match the config, not the table)
    if width == 320:
        assert 8e8 < n_par < 1.3e9, n_par
    else:
        assert 1.5e8 < n_par < 4e8, n_par
