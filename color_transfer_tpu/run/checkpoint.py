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
