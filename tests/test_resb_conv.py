"""Fused ResB Pallas kernel vs the XLA reference (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from color_transfer_tpu.ops.resb_conv import resb_apply


def _ref_resb(x, w1, b1, w2, b2, slope=0.01):
    y = lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b1
    y = jnp.where(y >= 0, y, slope * y)
    y = lax.conv_general_dilated(
        y, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b2
    return x + y


class TestResBKernel:
    def test_matches_xla_reference(self, rng):
        for b, h, w, c in [(1, 20, 128, 16), (2, 16, 64, 8), (1, 7, 32, 8)]:
            x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)) * 0.5
            w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)) * 0.1
            w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32)) * 0.1
            b1 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1
            b2 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1
            want = np.asarray(_ref_resb(x, w1, b1, w2, b2))
            got = np.asarray(resb_apply(x, w1, b1, w2, b2, interpret=True))
            # bf16 operand storage through two chained convs: a few percent
            # worst-case relative error on random weights.
            assert np.abs(got - want).max() < 0.08, (b, h, w, c)
            assert (
                np.abs(got - want) / (np.abs(want) + 0.1)
            ).max() < 0.08, (b, h, w, c)
