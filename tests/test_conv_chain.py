"""Fused ResB conv-chain kernel vs the XLA conv oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu.ops.conv_chain import resb_chain


def _oracle(x, kernels, biases):
    """Plain XLA ResB chain: conv3x3 -> LeakyReLU(0.01) -> conv3x3 -> +x."""
    for l in range(kernels.shape[0]):
        y = jax.lax.conv_general_dilated(
            x, kernels[l, 0], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + biases[l, 0]
        y = jnp.where(y >= 0, y, 0.01 * y)
        y = jax.lax.conv_general_dilated(
            y, kernels[l, 1], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + biases[l, 1]
        x = x + y
    return x


def _make(rng, layers, b=1, h=24, w=40, c=8):
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((layers, 2, 3, 3, c, c)) * 0.2, jnp.float32
    )
    bias = jnp.asarray(rng.standard_normal((layers, 2, c)) * 0.1, jnp.float32)
    return x, k, bias


class TestResBChain:
    def test_single_group_single_tile(self, rng):
        x, k, bias = _make(rng, layers=2)
        want = _oracle(x, k, bias)
        got = resb_chain(x, k, bias, group=2, rows=32,
                         compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    def test_multi_tile_multi_group(self, rng):
        """h=40 over rows=16 strips (3 tiles, ragged last) x 2 groups —
        exercises halo handoff, out-of-image masking, inter-group HBM
        staging."""
        x, k, bias = _make(rng, layers=4, b=2, h=40, w=20)
        want = _oracle(x, k, bias)
        got = resb_chain(x, k, bias, group=2, rows=16,
                         compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)

    def test_group_split_is_invariant(self, rng):
        """group=1 vs group=3 must agree exactly (same per-conv zero
        padding semantics regardless of fusion depth)."""
        x, k, bias = _make(rng, layers=3, h=30, w=17)
        a = resb_chain(x, k, bias, group=1, rows=16,
                       compute_dtype=jnp.float32, interpret=True)
        b = resb_chain(x, k, bias, group=3, rows=16,
                       compute_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)

    def test_bf16_recipe_close_to_f32(self, rng):
        x, k, bias = _make(rng, layers=2, h=16, w=16)
        want = _oracle(x, k, bias)
        got = resb_chain(x, k, bias, group=2, rows=16,
                         compute_dtype=jnp.bfloat16, interpret=True)
        # bf16 operands, f32 accumulate: ~1e-2 relative on unit-scale data.
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        scale = np.abs(np.asarray(want)).max()
        assert err / scale < 0.03, (err, scale)

    def test_rejects_indivisible_group(self, rng):
        x, k, bias = _make(rng, layers=3)
        with pytest.raises(ValueError):
            resb_chain(x, k, bias, group=2, interpret=True)


class TestModelIntegration:
    def test_dcmcs3di_fused_extraction_matches_flax(self, rng):
        """fused_extraction=True on the inference path must reproduce the
        flax Extractor (same param tree read directly)."""
        from color_transfer_tpu.models.dcmcs3di import DCMCS3DI

        model = DCMCS3DI(extraction_layers=2, transfer_layers=1, channels=8)
        left = jnp.asarray(rng.uniform(0, 1, (1, 24, 40, 3)), jnp.float32)
        right = jnp.clip(left * 0.9 + 0.03, 0, 1)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)

        want, _ = model.apply(
            variables, left, right, inference=True, use_pallas=True,
            pallas_interpret=True, fused_extraction=False,
        )
        got, _ = model.apply(
            variables, left, right, inference=True, use_pallas=True,
            pallas_interpret=True, fused_extraction=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )

    def test_auto_engages_only_on_bf16_pallas_path(self, rng, monkeypatch):
        """fused_extraction=None: off for f32 (bit-strict parity path),
        on for the bf16 recipe under use_pallas."""
        from color_transfer_tpu.models import dcmcs3di as m

        calls = {"n": 0}
        import color_transfer_tpu.ops.conv_chain as cc

        real = cc.resb_chain

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **{**k, "interpret": True})

        monkeypatch.setattr(cc, "resb_chain", counting)

        left = jnp.asarray(rng.uniform(0, 1, (1, 16, 24, 3)), jnp.float32)
        right = jnp.clip(left * 0.9, 0, 1)

        f32 = m.DCMCS3DI(extraction_layers=1, transfer_layers=1, channels=8)
        v32 = jax.jit(f32.init)(jax.random.PRNGKey(0), left, right)
        f32.apply(v32, left, right, inference=True, use_pallas=True,
                  pallas_interpret=True)
        assert calls["n"] == 0

        bf = m.DCMCS3DI(extraction_layers=1, transfer_layers=1, channels=8,
                        compute_dtype=jnp.bfloat16)
        vbf = jax.jit(bf.init)(jax.random.PRNGKey(0), left, right)
        bf.apply(vbf, left, right, inference=True, use_pallas=True,
                 pallas_interpret=True)
        assert calls["n"] == 2  # extraction stack + transfer stack
