"""Orbax checkpointing with best-metric gating.

The reference delegates checkpointing to Lightning's ModelCheckpoint
monitoring "Validation PSNR/dataloader_idx_0" with mode=max
(reference configs/dcmcs3di.yaml:23-27) and embeds hyperparameters via
save_hyperparameters (reference methods/dcmcs3di.py:36). Equivalent here:
orbax saves {params, opt_state, step, hparams}; ``best`` tracks the monitored
metric and only overwrites on improvement.
"""

import json
from pathlib import Path

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir, monitor="Validation PSNR/dataloader_idx_0", mode="max"):
        self.ckpt_dir = Path(ckpt_dir).absolute()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._ckpt = ocp.StandardCheckpointer()
        self._best_path = self.ckpt_dir / "best_score.json"

    @property
    def best_score(self):
        if self._best_path.exists():
            return json.loads(self._best_path.read_text())["score"]
        return None

    def _improved(self, score):
        best = self.best_score
        if best is None:
            return True
        return score > best if self.mode == "max" else score < best

    def save_last(self, state, hparams=None, step=None, epoch=None):
        self._save(self.ckpt_dir / "last", state, hparams, step, epoch)

    def save_best(self, state, metrics, hparams=None, step=None, epoch=None):
        """Save under 'best' iff the monitored metric improved. Returns True
        when saved."""
        score = float(metrics[self.monitor])
        if not self._improved(score):
            return False
        self._save(self.ckpt_dir / "best", state, hparams, step, epoch)
        self._best_path.write_text(json.dumps({"score": score, "step": step}))
        return True

    def _save(self, path, state, hparams, step, epoch=None):
        path = Path(path)
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._ckpt.save(path / "state", state)
        # StandardCheckpointer commits asynchronously; barrier before any
        # subsequent overwrite of the same directory.
        self._ckpt.wait_until_finished()
        meta = {"step": step, "epoch": epoch, "hparams": hparams or {}}
        (path / "meta.json").parent.mkdir(parents=True, exist_ok=True)
        (path / "meta.json").write_text(json.dumps(meta))

    def restore(self, which="best", target=None):
        """Restore a checkpoint pytree (``target`` gives structure/dtypes)."""
        path = self.ckpt_dir / which
        state = self._ckpt.restore(path / "state", target=target)
        meta = json.loads((path / "meta.json").read_text())
        return state, meta


def load_checkpoint(path, target=None):
    """Load a standalone checkpoint directory saved by CheckpointManager."""
    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(path / "state", target=target)
    meta = json.loads((path / "meta.json").read_text())
    return state, meta


def restore_eval_variables(module, ckpt_path, sample):
    """Restore a module's eval variables from a checkpoint directory.

    The restore target's structure comes from a fresh ``init_state`` — on a
    small spatial crop of ``sample``, since parameter/optimizer shapes are
    resolution-independent and a full-resolution throwaway init would trace
    the whole model at serving size just to learn the tree. Returns
    ``{'params': ..., 'batch_stats': ...}`` (or bare params when the module
    keeps no batch statistics), or None for a parameterless module — the
    single implementation behind CLI test/validate and deep video serving.
    """
    import jax
    import jax.numpy as jnp

    small = {
        k: (
            jnp.asarray(v[:1, : min(64, v.shape[1]), : min(64, v.shape[2])])
            if hasattr(v, "ndim") and v.ndim == 4
            else v
        )
        for k, v in sample.items()
    }
    state = module.init_state(jax.random.PRNGKey(0), small)
    if state is None:
        return None
    target = {"params": state.params, "opt_state": state.opt_state}
    if getattr(state, "batch_stats", None):
        target["batch_stats"] = state.batch_stats
    restored, _ = load_checkpoint(ckpt_path, target=target)
    if "batch_stats" in restored:
        return {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
    return restored["params"]
