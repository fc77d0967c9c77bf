"""Tests for the auxiliary UniMatch variants (1D attention, stereo matching)."""

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.models import gmflow_extras as gx


class TestAttention1D:
    def test_full_1d_matches_rowwise_softmax(self, rng):
        b, h, w, c = 2, 3, 8, 16
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
            for _ in range(3)
        ]
        out = np.asarray(gx.full_attention_1d(q, k, v, h, w))
        qr = np.asarray(q).reshape(b, h, w, c)
        kr = np.asarray(k).reshape(b, h, w, c)
        vr = np.asarray(v).reshape(b, h, w, c)
        scores = np.einsum("bhwc,bhvc->bhwv", qr, kr) / np.sqrt(c)
        att = np.exp(scores - scores.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        want = np.einsum("bhwv,bhvc->bhwc", att, vr).reshape(b, h * w, c)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_swin_1d_no_shift_equals_windowed(self, rng):
        b, h, w, c = 1, 2, 16, 8
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
            for _ in range(3)
        ]
        out = gx.swin_attention_1d(q, k, v, num_splits=2, with_shift=False, h=h, w=w)
        assert out.shape == (b, h * w, c)
        assert np.isfinite(np.asarray(out)).all()

    def test_swin_1d_shift_runs(self, rng):
        b, h, w, c = 1, 2, 16, 8
        q, k, v = [
            jnp.asarray(rng.normal(size=(b, h * w, c)).astype(np.float32))
            for _ in range(3)
        ]
        out = gx.swin_attention_1d(q, k, v, num_splits=2, with_shift=True, h=h, w=w)
        assert np.isfinite(np.asarray(out)).all()


class TestStereoMatching:
    def test_global_recovers_shift(self, rng):
        # feature1 = feature0 shifted right by d -> disparity ~ d.
        b, h, w, c = 1, 4, 32, 32
        f0 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 8
        d = 3
        f1 = np.roll(f0, shift=-d, axis=2)  # right view: objects shift left
        disp, prob = gx.global_correlation_softmax_stereo(
            jnp.asarray(f0), jnp.asarray(f1)
        )
        inner = np.asarray(disp)[:, :, d + 2 : -2]
        np.testing.assert_allclose(inner, d, atol=0.2)
        assert np.asarray(disp).min() > -0.5  # triangular mask: disparity >= 0

    def test_local_recovers_shift(self, rng):
        b, h, w, c = 1, 4, 32, 32
        f0 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 8
        d = 2
        f1 = np.roll(f0, shift=-d, axis=2)
        disp, _ = gx.local_correlation_softmax_stereo(
            jnp.asarray(f0), jnp.asarray(f1), local_radius=4
        )
        inner = np.asarray(disp)[:, :, d + 4 : -4]
        np.testing.assert_allclose(inner, d, atol=0.2)


class TestAttnTypeRouting:
    def test_transformer_stereo_attn_types(self, rng):
        import jax
        from color_transfer_tpu.models.gmflow import FeatureTransformer

        tr = FeatureTransformer(num_layers=1, d_model=32)
        f0 = jnp.asarray(rng.normal(size=(1, 8, 16, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, 8, 16, 32)).astype(np.float32))
        variables = tr.init(jax.random.PRNGKey(0), f0, f1, 2)
        for attn_type in ["swin", "self_swin2d_cross_1d", "self_swin2d_cross_swin1d"]:
            a, b = tr.apply(variables, f0, f1, 2, attn_type)
            assert a.shape == f0.shape and np.isfinite(np.asarray(a)).all()
