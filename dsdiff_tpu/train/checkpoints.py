"""Orbax checkpointing with best-by-val-SSIM retention and resume.

Replaces all three reference mechanisms (SURVEY.md §5 checkpoint/resume):
Lightning ModelCheckpoint best/periodic triple
(train_main_DS_diffusion.py:65-88), the OpenAI rank-0 blobfile saves + MPI
chunked broadcast (train_util.py:305-328, dist_util.py:54-74), and the regex
checkpoint auto-discovery (train_main_DS_diffusion.py:129-145). Orbax writes
are async and per-host sharded; discovery is ``latest_step()``; best-k
retention keyed on ``val_ssim`` replaces the 'best-{epoch}' files.

Only arrays are checkpointed (params / EMA / opt state / sampler buffers +
a JSON metrics sidecar); the optimizer/apply_fn are rebuilt from config at
restore (state.replace over a freshly created TrainState).
"""
from __future__ import annotations

import jax
from pathlib import Path

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


def _match_layout(template, restored):
    """Match a restored pytree to the template's structure, converting the
    DSUNet stream_mode encoder layout (vmapped <-> sequential) if that is
    what separates them (ADVICE r2: checkpoints written before the
    sequential-encoder default silently failed to restore)."""
    t_def = jax.tree_util.tree_structure(template)
    if jax.tree_util.tree_structure(restored) == t_def:
        return restored
    from .surgery import convert_stream_layout

    converted = convert_stream_layout(restored)

    def norm_key(path):
        # dict keys, NamedTuple fields and sequence indices all stringify
        # differently; normalize to the bare name/index per level
        parts = []
        for p in path:
            for attr in ("key", "name", "idx"):
                v = getattr(p, attr, None)
                if v is not None:
                    parts.append(str(v))
                    break
            else:
                parts.append(str(p).strip(".[]'"))
        return "/".join(parts)

    flat = {
        norm_key(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    t_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    try:
        leaves = [flat[norm_key(path)] for path, _ in t_paths]
    except KeyError as e:
        raise ValueError(
            "checkpoint layout does not match the model even after "
            f"stream-layout conversion (missing {e}); check "
            "stream_mode / architecture"
        ) from None
    return jax.tree_util.tree_unflatten(t_def, leaves)


class CheckpointManager:
    def __init__(
        self,
        directory,
        max_to_keep: int = 3,
        best_metric: str = "val_ssim",
        keep_best: bool = True,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        # Retention: best-N by metric PLUS always the latest step. The
        # latest checkpoint is the resume anchor; pure best-N retention
        # (orbax best_fn + max_to_keep) garbage-collects a just-saved
        # step whenever its metric ranks below max_to_keep older ones,
        # which makes latest_step() non-monotone and can pin a resumed
        # run to an old step forever (hit in round 3 when pre-SSIM-fix
        # checkpoints carried impossible val_ssim>1 values that no
        # honest save could ever beat).
        pp = ocp.checkpoint_managers.preservation_policy
        metric_fn = lambda m: (m or {}).get(best_metric, -1.0)  # noqa: E731
        if keep_best:
            preserve = pp.AnyPreservationPolicy(
                [pp.LatestN(n=1), pp.BestN(get_metric_fn=metric_fn,
                                           n=max_to_keep)])
        else:
            preserve = pp.LatestN(n=max_to_keep)
        options = ocp.CheckpointManagerOptions(
            preservation_policy=preserve,
            # best_fn only powers best_step(); retention is the policy's
            best_fn=metric_fn if keep_best else None,
            # orbax's validator rejects best_mode=None despite its own
            # error message listing it as allowed
            best_mode="max",
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, sampler_state=None,
             metrics: dict | None = None):
        tree = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
        }
        if sampler_state is not None:
            tree["sampler"] = {
                "loss_history": sampler_state.loss_history,
                "loss_counts": sampler_state.loss_counts,
            }
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(tree),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def restore(self, state, sampler_state=None, step: int | None = None):
        """Restore into existing (state, sampler_state) templates; returns
        the updated pair (sampler unchanged if it wasn't saved)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return state, sampler_state
        template = {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
        }
        if sampler_state is not None:
            template["sampler"] = {
                "loss_history": sampler_state.loss_history,
                "loss_counts": sampler_state.loss_counts,
            }
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except Exception:
            # stream_mode layout drift (vmapped 'encoders' <-> sequential
            # 'encoder_{i}'): restore raw, rewrite the encoder layout to
            # the template's, then re-match leaves (ADVICE r2).
            raw = self._mgr.restore(step)
            restored = _match_layout(template, raw)
        state = state.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
        )
        if sampler_state is not None and "sampler" in restored:
            sampler_state = sampler_state.replace(
                loss_history=restored["sampler"]["loss_history"],
                loss_counts=restored["sampler"]["loss_counts"],
            )
        return state, sampler_state

    def restore_params(self, params_template, step: int | None = None,
                       ema: bool = True):
        """Load just (EMA) params for inference."""
        if step is None:
            step = self.best_step() or self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        key = "ema_params" if ema else "params"
        restored = self._mgr.restore(step)
        out = restored[key]
        if params_template is not None:
            out = _match_layout(params_template, out)
            # match the template's structure/dtypes (host numpy -> device)
            out = jax.tree.map(
                lambda t, v: jax.numpy.asarray(v, dtype=t.dtype),
                params_template, out,
            )
        return out

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
