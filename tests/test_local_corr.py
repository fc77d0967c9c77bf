"""Pallas local-correlation kernel vs the XLA row-gather path.

The kernel (ops/local_corr.py) must be value-identical (up to accumulation
order) to the XLA formulation for ARBITRARY flows — including far
out-of-bounds positions, which both paths must resolve to torch
grid_sample's zeros-padding semantics (reference unimatch/matching.py:89-126).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.gmflow import local_correlation_with_flow
from color_transfer_tpu.ops.local_corr import local_correlation_with_flow_pallas


def _pair(rng, b, h, w, c, flow_scale):
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    flow = jnp.asarray(
        (rng.normal(size=(b, h, w, 2)) * flow_scale).astype(np.float32)
    )
    return f0, f1, flow


class TestLocalCorrKernel:
    @pytest.mark.parametrize("variant", ["vpu", "mxu"])
    @pytest.mark.parametrize("flow_scale", [0.75, 6.0, 50.0])
    def test_matches_xla_f32(self, rng, flow_scale, variant):
        f0, f1, flow = _pair(rng, 2, 12, 16, 8, flow_scale)
        want = local_correlation_with_flow(
            f0, f1, flow, 4, corr_dtype=jnp.float32, impl="xla"
        )
        got = local_correlation_with_flow_pallas(
            f0, f1, flow, 4, corr_dtype=jnp.float32, p_blk=64, interpret=True,
            variant=variant,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    @pytest.mark.parametrize("variant", ["vpu", "mxu"])
    def test_matches_xla_bf16(self, rng, variant):
        f0, f1, flow = _pair(rng, 1, 8, 8, 16, 3.0)
        want = local_correlation_with_flow(
            f0, f1, flow, 4, corr_dtype=jnp.bfloat16, impl="xla"
        )
        got = local_correlation_with_flow_pallas(
            f0, f1, flow, 4, corr_dtype=jnp.bfloat16, p_blk=32, interpret=True,
            variant=variant,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    @pytest.mark.parametrize("variant", ["vpu", "mxu"])
    def test_non_divisible_pixel_blocks(self, rng, variant):
        # h*w = 6*10 = 60, not a multiple of p_blk=32: pads then crops.
        f0, f1, flow = _pair(rng, 1, 6, 10, 4, 2.0)
        want = local_correlation_with_flow(
            f0, f1, flow, 1, corr_dtype=jnp.float32, impl="xla"
        )
        got = local_correlation_with_flow_pallas(
            f0, f1, flow, 1, corr_dtype=jnp.float32, p_blk=32, interpret=True,
            variant=variant,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_pallas_path_differentiable(self, rng):
        """Regression: DMSCT's train step JVP-traces the frozen matcher with
        parameter tangents, so the pallas route MUST be linearizable — its
        custom VJP differentiates the identical XLA path (gmflow.py). Grads
        through both routes must match."""
        from color_transfer_tpu.models.gmflow import _local_corr_pallas_ad

        f0, f1, flow = _pair(rng, 1, 6, 8, 4, 2.0)

        def loss_pallas(f0, f1, flow):
            out = _local_corr_pallas_ad(2, jnp.dtype(jnp.float32), True, "mxu",
                                        f0, f1, flow)
            return jnp.sum(out * out)

        def loss_xla(f0, f1, flow):
            out = local_correlation_with_flow(
                f0, f1, flow, 2, corr_dtype=jnp.float32, impl="xla"
            )
            return jnp.sum(out * out)

        got = jax.grad(loss_pallas, argnums=(0, 1, 2))(f0, f1, flow)
        want = jax.grad(loss_xla, argnums=(0, 1, 2))(f0, f1, flow)
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w_), rtol=1e-4, atol=1e-4
            )

    def test_pallas_path_linearizes_under_value_and_grad(self, rng):
        """The crash mode itself: value_and_grad over a function whose
        FORWARD routes through the pallas kernel while the output is
        stop-gradient'ed (the frozen-matcher pattern in DMSCT)."""
        from color_transfer_tpu.models.gmflow import _local_corr_pallas_ad

        f0, f1, flow = _pair(rng, 1, 6, 8, 4, 2.0)

        def loss(f0):
            corr = _local_corr_pallas_ad(1, jnp.dtype(jnp.float32), True, "vpu",
                                         f0, f1, flow)
            return jnp.sum(f0) + jnp.sum(jax.lax.stop_gradient(corr))

        val, grad = jax.value_and_grad(loss)(f0)
        assert np.isfinite(float(val))
        np.testing.assert_allclose(np.asarray(grad), 1.0)

    def test_zero_flow_is_local_window_dot(self, rng):
        """Independent oracle: zero flow makes the op a plain shifted-window
        correlation computable with numpy."""
        b, h, w, c, r = 1, 6, 7, 3, 1
        f0 = rng.normal(size=(b, h, w, c)).astype(np.float32)
        f1 = rng.normal(size=(b, h, w, c)).astype(np.float32)
        got = np.asarray(
            local_correlation_with_flow_pallas(
                jnp.asarray(f0), jnp.asarray(f1), jnp.zeros((b, h, w, 2)),
                r, corr_dtype=jnp.float32, p_blk=32, interpret=True,
            )
        )
        f1p = np.pad(f1, ((0, 0), (r, r), (r, r), (0, 0)))
        for y in range(h):
            for x in range(w):
                idx = 0
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        want = (
                            f0[0, y, x] * f1p[0, y + dy + r, x + dx + r]
                        ).sum() / np.sqrt(c)
                        np.testing.assert_allclose(
                            got[0, y, x, idx], want, rtol=1e-5, atol=1e-5
                        )
                        idx += 1
