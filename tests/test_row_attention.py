"""Fused row-attention kernel vs the materialized XLA reference
(interpreter mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.models import pasm
from color_transfer_tpu.models.dcmcs3di import DCMCS3DI
from color_transfer_tpu.ops.row_attention import row_attention_warp, fused_parallax_inference


class TestRowAttentionKernel:
    def test_matches_materialized(self, rng):
        b, h, w, c = 2, 3, 96, 16  # w not a multiple of the tile -> padding path
        q = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        scale = 1.0 / c

        out, colsum = row_attention_warp(q, k, v, scale, tq=32, interpret=True, precise=True)

        att = jax.nn.softmax(jnp.einsum("bhwc,bhvc->bhwv", q, k) * scale, axis=-1)
        want_out = np.asarray(jnp.einsum("bhwv,bhvc->bhwc", att, v))
        want_cs = np.asarray(att.sum(axis=-2))

        np.testing.assert_allclose(np.asarray(out), want_out, atol=2e-5)
        np.testing.assert_allclose(np.asarray(colsum), want_cs, atol=2e-5)

    def test_fused_inference_matches_pasm(self, rng):
        b, h, w, c = 1, 4, 64, 8
        q_l, k_r, v_r, q_r, k_l = [
            jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
            for _ in range(5)
        ]
        scale = 1.0 / c

        warped, mask_l = fused_parallax_inference(
            q_l, k_r, v_r, q_r, k_l, scale, interpret=True, precise=True
        )

        cost_r2l = jnp.einsum("bhwc,bhvc->bhwv", q_l, k_r) * scale
        cost_l2r = jnp.einsum("bhwc,bhvc->bhwv", q_r, k_l) * scale
        att, _, masks = pasm.output((cost_r2l, cost_l2r), inference=True)
        want_warp = np.asarray(pasm.warp(v_r, att[0]))
        want_mask = np.asarray(masks[0])

        np.testing.assert_allclose(np.asarray(warped), want_warp, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(mask_l), want_mask)


class TestModelPallasPath:
    def test_model_fused_matches_reference_path(self, rng):
        model = DCMCS3DI(extraction_layers=1, transfer_layers=1, channels=8)
        b, h, w = 1, 6, 40
        left = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        right = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), left, right)

        ref, _ = model.apply(params, left, right, inference=True)
        fused, _ = model.apply(
            params, left, right, inference=True, use_pallas=True,
            pallas_interpret=True, pallas_precise=True,
        )
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)

    def test_model_fused_bf16_close(self, rng):
        # The production TPU path stores K/V in bf16; the end-to-end image
        # error stays well below metric-visible levels.
        model = DCMCS3DI(extraction_layers=1, transfer_layers=1, channels=8)
        b, h, w = 1, 6, 40
        left = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        right = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), left, right)
        ref, _ = model.apply(params, left, right, inference=True)
        fused, _ = model.apply(
            params, left, right, inference=True, use_pallas=True,
            pallas_interpret=True,
        )
        assert float(jnp.abs(fused - ref).max()) < 5e-3
