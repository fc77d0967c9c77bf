"""Tensor-parallel matcher sharding (parallel/tensor_parallel.py).

On the 8-device CPU mesh: shard the transformer projection/FFN weights
over a 'model' axis (Megatron column/row pairing), run the full GMFlow
forward under jit, and require the output to match the replicated run —
GSPMD must insert the activation collectives, not change the math.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from color_transfer_tpu.models.gmflow import GMFlow
from color_transfer_tpu.parallel import create_mesh
from color_transfer_tpu.parallel.tensor_parallel import (
    matcher_tp_shardings,
    shard_matcher_params,
)


def _model_and_inputs(rng):
    model = GMFlow(num_transformer_layers=2, num_reg_refine=1)
    img0 = jnp.asarray(
        (rng.uniform(0, 255, (2, 32, 64, 3))).astype(np.float32)
    )
    img1 = jnp.asarray(
        (rng.uniform(0, 255, (2, 32, 64, 3))).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)
    return model, variables, img0, img1


class TestMatcherTP:
    def test_sharding_specs_cover_transformer_matmuls(self, rng):
        model, variables, _, _ = _model_and_inputs(rng)
        mesh = create_mesh(shape=(2, 4), axis_names=("data", "model"))
        shardings = matcher_tp_shardings(variables["params"], mesh)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        col = row = rep = 0
        for path, sh in flat:
            keys = [getattr(p, "key", None) for p in path]
            if "transformer" in keys and keys[-1] == "kernel" and (
                keys[-2] in ("q_proj", "k_proj", "v_proj", "mlp_0")
            ):
                assert sh.spec == P(None, "model"), keys
                col += 1
            elif "transformer" in keys and keys[-1] == "kernel" and (
                keys[-2] in ("merge", "mlp_2")
            ):
                assert sh.spec == P("model", None), keys
                row += 1
            else:
                assert sh.spec == P(), keys
                rep += 1
        # 2 layers x (self_attn: q/k/v + merge; cross_attn_ffn: q/k/v +
        # merge + mlp_0 + mlp_2)
        assert col == 2 * (3 + 3 + 1)
        assert row == 2 * (1 + 1 + 1)
        assert rep > 0

    def test_tp_forward_matches_replicated(self, rng):
        model, variables, img0, img1 = _model_and_inputs(rng)
        mesh = create_mesh(shape=(2, 4), axis_names=("data", "model"))

        local = model.apply(variables, img0, img1)["flow"]

        params_tp = shard_matcher_params(variables["params"], mesh)
        data_sh = NamedSharding(mesh, P("data"))
        img0_s = jax.device_put(img0, data_sh)
        img1_s = jax.device_put(img1, data_sh)

        @jax.jit
        def fwd(p, a, b):
            return model.apply({"params": p}, a, b)["flow"]

        sharded = fwd(params_tp, img0_s, img1_s)
        # Sharding the C-contraction over 'model' reassociates the partial
        # sums (one psum of shard-local partials), and the GRU refinement
        # feeds flow back through gathers — a few 1e-4 of drift on
        # pixel-unit flow is the expected reassociation effect, not a
        # sharding bug.
        np.testing.assert_allclose(
            np.asarray(sharded), np.asarray(local), rtol=5e-3, atol=5e-3
        )
