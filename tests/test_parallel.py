"""Mesh/sharding tests on the virtual 8-device CPU mesh (SURVEY.md §2.8)."""

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu import methods, metrics
from color_transfer_tpu.parallel import create_mesh, shard_batch, replicated_sharding
from color_transfer_tpu.run.modules import DCMCS3DIModule


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_batch_sharded_classical(self, rng):
        mesh = create_mesh()
        b = 8
        gt = jnp.asarray(rng.uniform(0.2, 0.8, (b, 16, 24, 3)).astype(np.float32))
        batch = {
            "target": jnp.clip(gt * 1.1, 0, 1),
            "reference": jnp.clip(gt * 0.9, 0, 1),
        }
        sharded = shard_batch(batch, mesh)
        # Each frame's transfer is independent -> sharding must not change
        # results vs single-device execution.
        fn = jax.jit(jax.vmap(methods.linear.monge_kantorovitch))
        out_sharded = np.asarray(fn(sharded["target"], sharded["reference"]))
        out_local = np.asarray(fn(batch["target"], batch["reference"]))
        np.testing.assert_allclose(out_sharded, out_local, atol=1e-5)

    def test_metric_reduction_over_mesh(self, rng):
        mesh = create_mesh()
        x = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
        y = jnp.clip(x + 0.05, 0, 1)
        xs, ys = shard_batch({"x": x, "y": y}, mesh).values()
        psnr_sharded = float(jax.jit(metrics.psnr)(xs, ys))
        psnr_local = float(metrics.psnr(x, y))
        assert abs(psnr_sharded - psnr_local) < 1e-4

    def test_dp_train_step_matches_single_device(self, rng):
        """The sharded training step must produce the same update as the
        unsharded one (gradient all-reduce correctness)."""
        module = DCMCS3DIModule(
            extraction_layers=1, transfer_layers=1, channels=8, heavy_metrics=False
        )
        gt = jnp.asarray(rng.uniform(0, 1, (8, 8, 16, 3)).astype(np.float32))
        batch = {"gt": gt, "reference": jnp.clip(gt * 0.9, 0, 1)}
        key = jax.random.PRNGKey(1)

        state_a = module.init_state(jax.random.PRNGKey(0), {**batch, "target": gt})
        state_b = module.init_state(jax.random.PRNGKey(0), {**batch, "target": gt})

        mesh = create_mesh()
        state_b = jax.device_put(state_b, replicated_sharding(mesh))
        sharded = shard_batch(batch, mesh)

        new_a, logs_a = module.train_step(state_a, dict(batch), key)
        new_b, logs_b = module.train_step(state_b, sharded, key)

        assert abs(float(logs_a["Training Total Loss"]) - float(logs_b["Training Total Loss"])) < 1e-5
        for pa, pb in zip(
            jax.tree_util.tree_leaves(new_a.params),
            jax.tree_util.tree_leaves(new_b.params),
        ):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)


class TestDMSCTDataParallel:
    def test_dmsct_train_step_sharded_matches_local(self, rng):
        """BatchNorm statistics and the frozen matcher must behave
        identically under batch sharding (global-batch BN via XLA
        collectives)."""
        from color_transfer_tpu.run.modules import DMSCTModule

        module = DMSCTModule(
            heavy_metrics=False, matcher_num_layers=1, matcher_num_reg_refine=1
        )
        gt = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
        batch = {"gt": gt, "reference": jnp.clip(gt * 0.9 + 0.03, 0, 1)}
        key = jax.random.PRNGKey(1)

        state_a = module.init_state(jax.random.PRNGKey(0), {**batch, "target": gt})
        state_b = module.init_state(jax.random.PRNGKey(0), {**batch, "target": gt})

        mesh = create_mesh()
        state_b = jax.device_put(state_b, replicated_sharding(mesh))
        sharded = shard_batch(batch, mesh)

        new_a, logs_a = module.train_step(state_a, dict(batch), key)
        new_b, logs_b = module.train_step(state_b, sharded, key)

        assert (
            abs(
                float(logs_a["Training Total Loss"])
                - float(logs_b["Training Total Loss"])
            )
            < 1e-5
        )
        # BN stats identical (global-batch semantics preserved).
        for sa, sb in zip(
            jax.tree_util.tree_leaves(new_a.batch_stats),
            jax.tree_util.tree_leaves(new_b.batch_stats),
        ):
            np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), atol=1e-6)
