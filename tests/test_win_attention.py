"""Fused windowed-attention kernel (ops/win_attention.py) parity.

Interpret-mode kernel vs the XLA reference — the same harness shape as the
local-correlation kernel tests. Compiled-vs-interpret equality on real TPU
rides bench.py's integrity checks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu.ops.win_attention import (
    _pick_wb,
    eligible,
    ffn_eligible,
    ffn_fused,
    ffn_xla,
    shift_window_mask,
    window_attention_fused,
    window_attention_xla,
    window_sublayer_fused,
    window_sublayer_xla,
)


def _qkv(rng, bp, length, c, dtype=np.float32):
    mk = lambda: jnp.asarray(rng.normal(size=(bp, length, c)).astype(dtype))
    return mk(), mk(), mk()


class TestKernelParity:
    @pytest.mark.parametrize("bp,length,c", [(8, 24, 32), (6, 16, 64), (3, 8, 32)])
    def test_unmasked_f32(self, rng, bp, length, c):
        q, k, v = _qkv(rng, bp, length, c)
        out = window_attention_fused(q, k, v, interpret=True)
        ref = window_attention_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_masked_f32(self, rng):
        bp, length, c, n_mask = 8, 24, 32, 4
        q, k, v = _qkv(rng, bp, length, c)
        mask = jnp.asarray(
            np.where(rng.uniform(size=(n_mask, length, length)) > 0.7,
                     -100.0, 0.0).astype(np.float32)
        )
        out = window_attention_fused(q, k, v, mask, interpret=True)
        ref = window_attention_xla(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_bf16(self, rng):
        q, k, v = _qkv(rng, 4, 16, 32)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        out = window_attention_fused(q, k, v, interpret=True)
        ref = window_attention_xla(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    @pytest.mark.parametrize(
        "k,hs,ws,imgs",
        [(2, 4, 6, 1), (2, 5, 7, 2), (4, 2, 3, 1)],  # odd + even windows
    )
    def test_shift_geometry_matches_numpy_mask(self, rng, k, hs, ws, imgs):
        # The in-kernel geometry mask must equal the trace-time numpy swin
        # mask (reference unimatch/utils.py:87-111) for every window.
        bp, length, c = imgs * k * k, hs * ws, 32
        q, kk, v = _qkv(rng, bp, length, c)
        out = window_attention_fused(
            q, kk, v, shift_windows=(k, hs, ws), interpret=True
        )
        mask = jnp.asarray(shift_window_mask(k * hs, k * ws, k))
        ref = window_attention_xla(q, kk, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_shift_geometry_grad_matches_xla(self, rng):
        k, hs, ws, c = 2, 4, 6, 32
        q, kk, v = _qkv(rng, k * k, hs * ws, c)
        mask = jnp.asarray(shift_window_mask(k * hs, k * ws, k))

        def loss_fused(q, kk, v):
            return window_attention_fused(
                q, kk, v, shift_windows=(k, hs, ws), interpret=True
            ).sum()

        def loss_ref(q, kk, v):
            return window_attention_xla(q, kk, v, mask).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, kk, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_mask_and_geometry_mutually_exclusive(self, rng):
        q, k, v = _qkv(rng, 4, 8, 32)
        mask = jnp.zeros((4, 8, 8), jnp.float32)
        with pytest.raises(ValueError, match="not both"):
            window_attention_fused(
                q, k, v, mask, shift_windows=(2, 2, 4), interpret=True
            )

    def test_mask_period_mismatch_raises(self, rng):
        q, k, v = _qkv(rng, 6, 8, 32)
        mask = jnp.zeros((4, 8, 8), jnp.float32)
        with pytest.raises(ValueError, match="mask periods"):
            window_attention_fused(q, k, v, mask, interpret=True)

    def test_grad_matches_xla(self, rng):
        bp, length, c = 4, 16, 32
        q, k, v = _qkv(rng, bp, length, c)
        mask = jnp.asarray(
            np.where(rng.uniform(size=(2, length, length)) > 0.7,
                     -100.0, 0.0).astype(np.float32)
        )

        def loss_fused(q, k, v):
            return window_attention_fused(q, k, v, mask, interpret=True).sum()

        def loss_ref(q, k, v):
            return window_attention_xla(q, k, v, mask).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestSublayerKernel:
    """Whole-sublayer kernel (q/kv projections + attention + merge +
    LayerNorm [+ residual])."""

    def _weights(self, rng, c):
        mk = lambda shape: jnp.asarray(
            (rng.normal(size=shape) / np.sqrt(shape[0])).astype(np.float32)
        )
        ns = jnp.asarray((1 + 0.1 * rng.normal(size=c)).astype(np.float32))
        nb = jnp.asarray((0.1 * rng.normal(size=c)).astype(np.float32))
        return mk((c, c)), mk((c, 2 * c)), mk((c, c)), ns, nb

    @pytest.mark.parametrize("self_attn", [True, False])
    @pytest.mark.parametrize("residual", [False, True])
    def test_parity_unshifted(self, rng, self_attn, residual):
        bp, length, c = 8, 24, 32
        xs = jnp.asarray(rng.normal(size=(bp, length, c)).astype(np.float32))
        xt = xs if self_attn else jnp.asarray(
            rng.normal(size=(bp, length, c)).astype(np.float32)
        )
        wq, wkv, wm, ns, nb = self._weights(rng, c)
        out = window_sublayer_fused(xs, xt, wq, wkv, wm, ns, nb,
                                    add_residual=residual, interpret=True)
        ref = window_sublayer_xla(xs, xt, wq, wkv, wm, norm=(ns, nb),
                                  add_residual=residual)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)

    @pytest.mark.parametrize("k,hs,ws,imgs", [(2, 4, 6, 1), (2, 5, 7, 2)])
    def test_parity_shifted_geometry(self, rng, k, hs, ws, imgs):
        bp, length, c = imgs * k * k, hs * ws, 32
        xs = jnp.asarray(rng.normal(size=(bp, length, c)).astype(np.float32))
        xt = jnp.asarray(rng.normal(size=(bp, length, c)).astype(np.float32))
        wq, wkv, wm, ns, nb = self._weights(rng, c)
        out = window_sublayer_fused(
            xs, xt, wq, wkv, wm, ns, nb, shift_windows=(k, hs, ws),
            interpret=True
        )
        mask = jnp.asarray(shift_window_mask(k * hs, k * ws, k))
        ref = window_sublayer_xla(xs, xt, wq, wkv, wm, mask, norm=(ns, nb))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)

    def test_bf16(self, rng):
        bp, length, c = 4, 16, 32
        xs = jnp.asarray(
            rng.normal(size=(bp, length, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wq, wkv, wm, ns, nb = self._weights(rng, c)
        wq, wkv, wm = (w.astype(jnp.bfloat16) for w in (wq, wkv, wm))
        out = window_sublayer_fused(xs, xs, wq, wkv, wm, ns, nb,
                                    interpret=True)
        ref = window_sublayer_xla(xs, xs, wq, wkv, wm, norm=(ns, nb))
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=4e-2, atol=4e-2,
        )

    def test_grad_matches_xla(self, rng):
        bp, length, c = 4, 12, 32
        xs = jnp.asarray(rng.normal(size=(bp, length, c)).astype(np.float32))
        wq, wkv, wm, ns, nb = self._weights(rng, c)
        k_geom = (2, 3, 4)

        def loss_fused(xs, wq, wkv, wm, ns, nb):
            # self-attention: same tensor twice — AD must sum cotangents
            return window_sublayer_fused(
                xs, xs, wq, wkv, wm, ns, nb, shift_windows=k_geom,
                add_residual=True, interpret=True
            ).sum()

        mask = jnp.asarray(shift_window_mask(2 * 3, 2 * 4, 2))

        def loss_ref(xs, wq, wkv, wm, ns, nb):
            return window_sublayer_xla(
                xs, xs, wq, wkv, wm, mask, norm=(ns, nb), add_residual=True
            ).sum()

        gf = jax.grad(loss_fused, argnums=tuple(range(6)))(
            xs, wq, wkv, wm, ns, nb
        )
        gr = jax.grad(loss_ref, argnums=tuple(range(6)))(
            xs, wq, wkv, wm, ns, nb
        )
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a).reshape(-1), np.asarray(b).reshape(-1),
                rtol=1e-5, atol=1e-5,
            )

    def test_shape_validation(self, rng):
        xs = jnp.zeros((4, 8, 32), jnp.float32)
        ns = jnp.ones((32,), jnp.float32)
        with pytest.raises(ValueError, match="weight shapes"):
            window_sublayer_fused(
                xs, xs, jnp.zeros((32, 32)), jnp.zeros((32, 32)),
                jnp.zeros((32, 32)), ns, ns, interpret=True
            )


class TestFFNKernel:
    """Fused exact-gelu FFN kernel (+ LayerNorm + residual) — the
    (L, ffn_dim) intermediate stays in VMEM; the split first dot must
    equal the concatenated one."""

    def _setup(self, rng, bp=6, length=16, c=32, f=64, dtype=np.float32):
        mk = lambda shape: jnp.asarray(
            (rng.normal(size=shape) / np.sqrt(shape[0])).astype(dtype)
        )
        xs = jnp.asarray(rng.normal(size=(bp, length, c)).astype(dtype))
        xm = jnp.asarray(rng.normal(size=(bp, length, c)).astype(dtype))
        ns = jnp.asarray((1 + 0.1 * rng.normal(size=c)).astype(np.float32))
        nb = jnp.asarray((0.1 * rng.normal(size=c)).astype(np.float32))
        return xs, xm, mk((2 * c, f)), mk((f, c)), ns, nb

    @pytest.mark.parametrize("residual", [False, True])
    def test_parity_f32(self, rng, residual):
        xs, xm, w0, w2, ns, nb = self._setup(rng)
        out = ffn_fused(xs, xm, w0, w2, ns, nb, add_residual=residual,
                        interpret=True)
        ref = ffn_xla(xs, xm, w0, w2, norm=(ns, nb), add_residual=residual)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)

    def test_parity_bf16(self, rng):
        xs, xm, w0, w2, ns, nb = self._setup(rng)
        xs, xm, w0, w2 = (x.astype(jnp.bfloat16) for x in (xs, xm, w0, w2))
        out = ffn_fused(xs, xm, w0, w2, ns, nb, interpret=True)
        ref = ffn_xla(xs, xm, w0, w2, norm=(ns, nb))
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=4e-2, atol=4e-2,
        )

    def test_grad_matches_xla(self, rng):
        xs, xm, w0, w2, ns, nb = self._setup(rng, bp=4, length=8)

        def loss_fused(*args):
            return ffn_fused(*args, add_residual=True, interpret=True).sum()

        def loss_ref(xs, xm, w0, w2, ns, nb):
            return ffn_xla(xs, xm, w0, w2, norm=(ns, nb),
                           add_residual=True).sum()

        gf = jax.grad(loss_fused, argnums=tuple(range(6)))(
            xs, xm, w0, w2, ns, nb
        )
        gr = jax.grad(loss_ref, argnums=tuple(range(6)))(
            xs, xm, w0, w2, ns, nb
        )
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a).reshape(-1), np.asarray(b).reshape(-1),
                rtol=1e-5, atol=1e-5,
            )

    def test_eligibility(self):
        # train scale1 and fullres scale1 both fit; absurd ffn_dim does not
        assert ffn_eligible((6144, 120, 128), jnp.float32, 1024)
        assert ffn_eligible((256, 448, 128), jnp.float32, 1024)
        assert not ffn_eligible((8, 4096, 128), jnp.float32, 65536)

    def test_shape_validation(self, rng):
        xs, xm, w0, w2, ns, nb = self._setup(rng)
        with pytest.raises(ValueError, match="inconsistent"):
            ffn_fused(xs, xm, w0[:10], w2, ns, nb, interpret=True)


class TestRouting:
    def test_pick_wb(self):
        assert _pick_wb(6144) == 8
        assert _pick_wb(12) == 4
        assert _pick_wb(6) == 2
        assert _pick_wb(5) == 1

    def test_eligibility_bounds(self):
        # train-shape scale1 windows fit; fullres scale0 (L=1792) does not
        assert eligible((6144, 120, 128), jnp.float32, (64, 120, 120))
        assert not eligible((32, 1792, 128), jnp.float32, None)

    def test_transformer_fused_matches_default(self, rng):
        from color_transfer_tpu.models.gmflow import FeatureTransformer

        f0 = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
        base = FeatureTransformer(num_layers=2, d_model=32)
        fused = FeatureTransformer(num_layers=2, d_model=32,
                                   fused_attention="interpret")
        variables = base.init(jax.random.PRNGKey(0), f0, f1, 2)
        a0, a1 = base.apply(variables, f0, f1, 2)
        b0, b1 = fused.apply(variables, f0, f1, 2)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(b0),
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(b1),
                                   rtol=1e-6, atol=1e-5)

    def test_fused_flag_actually_routes_to_kernel(self, rng):
        # Guard against silent-fallback regressions: with the flag on (and
        # eligible shapes) the traced program must contain a pallas_call;
        # with it off it must not.
        from color_transfer_tpu.models.gmflow import FeatureTransformer

        f0 = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
        base = FeatureTransformer(num_layers=2, d_model=32)
        fused = FeatureTransformer(num_layers=2, d_model=32,
                                   fused_attention="interpret")
        variables = base.init(jax.random.PRNGKey(0), f0, f1, 2)
        jaxpr_fused = str(jax.make_jaxpr(
            lambda v, a, b: fused.apply(v, a, b, 2))(variables, f0, f1))
        jaxpr_base = str(jax.make_jaxpr(
            lambda v, a, b: base.apply(v, a, b, 2))(variables, f0, f1))
        assert "pallas_call" in jaxpr_fused
        assert "pallas_call" not in jaxpr_base

    def test_auto_default_follows_dtype(self, rng, monkeypatch):
        # Default fused_attention="auto": fused kernels route in exactly
        # when the compute dtype is bfloat16 (PERF.md round-3 A/B — the
        # f32 kernels need 6-pass HIGHEST dots and lose to XLA's one-pass
        # lowering, bf16 is exact in one pass and wins). Trace with the
        # backend spoofed to "tpu" so the auto resolution is what routes.
        import color_transfer_tpu.models.gmflow as gmflow_mod
        from color_transfer_tpu.models.gmflow import FeatureTransformer

        f0 = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(2, 8, 16, 32)).astype(np.float32))
        f32_model = FeatureTransformer(num_layers=1, d_model=32)
        bf16_model = FeatureTransformer(num_layers=1, d_model=32,
                                        dtype=jnp.bfloat16)
        variables = f32_model.init(jax.random.PRNGKey(0), f0, f1, 2)
        monkeypatch.setattr(gmflow_mod.jax, "default_backend",
                            lambda: "tpu")
        jaxpr_f32 = str(jax.make_jaxpr(
            lambda v, a, b: f32_model.apply(v, a, b, 2))(variables, f0, f1))
        jaxpr_bf16 = str(jax.make_jaxpr(
            lambda v, a, b: bf16_model.apply(v, a, b, 2))(variables, f0, f1))
        assert "pallas_call" not in jaxpr_f32
        assert "pallas_call" in jaxpr_bf16

    def test_fused_true_off_tpu_falls_back(self, rng):
        # On the CPU test backend, fused_attention=True must silently take
        # the XLA path (no Mosaic compile attempted) and match exactly.
        from color_transfer_tpu.models.gmflow import FeatureTransformer

        f0 = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
        base = FeatureTransformer(num_layers=1, d_model=32)
        fused = FeatureTransformer(num_layers=1, d_model=32,
                                   fused_attention=True)
        variables = base.init(jax.random.PRNGKey(0), f0, f1, 2)
        a0, _ = base.apply(variables, f0, f1, 2)
        b0, _ = fused.apply(variables, f0, f1, 2)
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))
