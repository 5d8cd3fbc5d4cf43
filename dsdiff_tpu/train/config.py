"""Two-tier YAML config system.

Parity with the reference's config stack (SURVEY.md §5): a run config
(configs/train_config.py:15-69 — argparse --config_file -> YAML -> attr
object) merged with a model config (OmegaConf YAML,
train_main_with_gaussian_diff.py:105-137). OmegaConf is replaced by a small
attr-dict with recursive merge; model instantiation goes through the explicit
registry (models/wrapper.py) keyed by ``model.name`` instead of dotted
``target:`` paths.
"""
from __future__ import annotations

import copy
from pathlib import Path

import yaml

__all__ = ["Config", "load_config", "merge", "load_run_config"]


class Config(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)

    def get_path(self, dotted: str, default=None):
        cur = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def load_config(path) -> Config:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return Config.wrap(data)


def merge(base: dict, override: dict) -> Config:
    """Recursive merge; override wins (OmegaConf.merge semantics)."""
    out = copy.deepcopy(dict(base))
    for k, v in (override or {}).items():
        if (
            k in out
            and isinstance(out[k], dict)
            and isinstance(v, dict)
        ):
            out[k] = merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return Config.wrap(out)


def load_run_config(run_path, model_path=None, overrides: dict | None = None):
    """run YAML (+ optional model YAML referenced by ``config_opt`` or given
    explicitly) -> merged Config (train_main_with_gaussian_diff.py:49,137)."""
    cfg = load_config(run_path)
    mp = model_path or cfg.get("config_opt")
    if mp:
        mp = Path(mp)
        if not mp.is_absolute():
            mp = Path(run_path).parent / mp
        cfg = merge(cfg, load_config(mp))
    if overrides:
        cfg = merge(cfg, overrides)
    return cfg
