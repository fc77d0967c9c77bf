"""Checkpoint save/restore/resume tests."""

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.run.checkpoint import CheckpointManager, load_checkpoint
from color_transfer_tpu.run.modules import DCMCS3DIModule


def _batch(rng, b=2, h=8, w=16):
    gt = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    return {
        "gt": gt,
        "target": jnp.clip(gt * 1.1, 0, 1),
        "reference": jnp.clip(gt * 0.9, 0, 1),
    }


class TestCheckpointManager:
    def test_best_gating(self, tmp_path, rng):
        mgr = CheckpointManager(tmp_path, monitor="Validation PSNR/dataloader_idx_0")
        state = {"params": {"w": np.ones(3)}, "opt_state": {}}
        assert mgr.save_best(state, {"Validation PSNR/dataloader_idx_0": 20.0}, step=1)
        assert not mgr.save_best(
            state, {"Validation PSNR/dataloader_idx_0": 19.0}, step=2
        )
        assert mgr.save_best(state, {"Validation PSNR/dataloader_idx_0": 21.0}, step=3)
        assert mgr.best_score == 21.0

        restored, meta = mgr.restore("best", target=state)
        np.testing.assert_array_equal(restored["params"]["w"], np.ones(3))
        assert meta["step"] == 3

    def test_roundtrip_module_state(self, tmp_path, rng):
        module = DCMCS3DIModule(
            extraction_layers=1, transfer_layers=1, channels=8, heavy_metrics=False
        )
        batch = _batch(rng)
        state = module.init_state(jax.random.PRNGKey(0), batch)
        state, _ = module.train_step(state, dict(batch), jax.random.PRNGKey(1))

        mgr = CheckpointManager(tmp_path)
        mgr.save_last(
            {"params": state.params, "opt_state": state.opt_state},
            hparams=module.hparams,
            step=int(state.step),
        )

        fresh = module.init_state(jax.random.PRNGKey(2), batch)
        restored, meta = load_checkpoint(
            tmp_path / "last",
            target={"params": fresh.params, "opt_state": fresh.opt_state},
        )
        assert meta["step"] == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(restored["params"]),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
