"""Window-major FeatureTransformer layout equivalence.

The swin stack can run with tokens held in window-major layout across all
layers (models/gmflow.py::FeatureTransformer docstring) — a pure layout
reordering of the same per-token math. These tests pin that the fast path
is numerically identical to the layout-naive path for both the unshifted
and shifted layer mix, odd window sizes, and a bf16 compute dtype.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.gmflow import FeatureTransformer


def _pair(rng, shape):
    f0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    return f0, f1


class TestWindowMajorEquivalence:
    @pytest.mark.parametrize(
        "shape,splits,layers",
        [
            ((2, 8, 16, 32), 2, 2),   # one shifted layer
            ((1, 16, 30, 32), 2, 3),  # odd ws=15 windows, shifted+unshifted
            ((2, 16, 16, 32), 4, 2),  # many small windows
        ],
    )
    def test_matches_naive_path(self, rng, shape, splits, layers):
        fast = FeatureTransformer(num_layers=layers, d_model=shape[-1])
        naive = FeatureTransformer(
            num_layers=layers, d_model=shape[-1], window_major=False
        )
        f0, f1 = _pair(rng, shape)
        variables = jax.jit(fast.init, static_argnums=3)(
            jax.random.PRNGKey(0), f0, f1, splits
        )
        a0, a1 = jax.jit(fast.apply, static_argnums=3)(variables, f0, f1, splits)
        b0, b1 = jax.jit(naive.apply, static_argnums=3)(variables, f0, f1, splits)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(b0),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                                   rtol=1e-6, atol=1e-5)

    def test_splits1_uses_same_path(self, rng):
        # splits == 1 has no windows; both flags must agree trivially.
        fast = FeatureTransformer(num_layers=2, d_model=32)
        naive = FeatureTransformer(num_layers=2, d_model=32, window_major=False)
        f0, f1 = _pair(rng, (1, 8, 8, 32))
        variables = fast.init(jax.random.PRNGKey(0), f0, f1, 1)
        a0, _ = fast.apply(variables, f0, f1, 1)
        b0, _ = naive.apply(variables, f0, f1, 1)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))

    def test_bf16_compute_dtype(self, rng):
        fast = FeatureTransformer(num_layers=2, d_model=32,
                                  dtype=jnp.bfloat16)
        naive = FeatureTransformer(num_layers=2, d_model=32,
                                   dtype=jnp.bfloat16, window_major=False)
        f0, f1 = _pair(rng, (2, 8, 16, 32))
        variables = fast.init(jax.random.PRNGKey(0), f0, f1, 2)
        a0, _ = fast.apply(variables, f0, f1, 2)
        b0, _ = naive.apply(variables, f0, f1, 2)
        np.testing.assert_allclose(
            np.asarray(a0, np.float32), np.asarray(b0, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_param_tree_unchanged(self, rng):
        # The fast path must not change the parameter layout the torch
        # converter targets (layer_i/{self_attn,cross_attn_ffn}/...).
        fast = FeatureTransformer(num_layers=1, d_model=32)
        f0, f1 = _pair(rng, (1, 8, 8, 32))
        params = fast.init(jax.random.PRNGKey(0), f0, f1, 2)["params"]
        assert set(params) == {"layer_0"}
        assert set(params["layer_0"]) == {"self_attn", "cross_attn_ffn"}
        assert set(params["layer_0"]["self_attn"]) == {
            "q_proj", "k_proj", "v_proj", "merge", "norm1"
        }
