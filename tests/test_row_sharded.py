"""Row-sharded (sequence-parallel) attention equals the local computation."""

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.models import pasm
from color_transfer_tpu.parallel import create_mesh
from color_transfer_tpu.parallel.row_attention_sp import sharded_parallax_inference


class TestRowSharded:
    def test_matches_local(self, rng):
        mesh = create_mesh(shape=(8,), axis_names=("seq",))
        b, h, w, c = 1, 16, 32, 8  # h divisible by 8 devices
        q_l, k_r, v_r, q_r, k_l = [
            jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
            for _ in range(5)
        ]
        scale = 1.0 / c
        warped, mask = sharded_parallax_inference(
            mesh, q_l, k_r, v_r, q_r, k_l, scale
        )

        att, _, masks = pasm.output(
            (
                jnp.einsum("bhwc,bhvc->bhwv", q_l, k_r) * scale,
                jnp.einsum("bhwc,bhvc->bhwv", q_r, k_l) * scale,
            ),
            inference=True,
        )
        np.testing.assert_allclose(
            np.asarray(warped), np.asarray(pasm.warp(v_r, att[0])), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(masks[0]))
