"""Tests for the six classical methods via their defining properties.

Each global method is characterized by an exact moment-matching property
(e.g. Reinhard: output Lab mean/std equals the reference image's — that IS
the algorithm), which tests correctness more strongly than mirroring the
reference implementation line by line. IDT/grading are checked by
distributional convergence and determinism.
"""

import numpy as np
import jax
import jax.numpy as jnp

from color_transfer_tpu import methods
from color_transfer_tpu.core.colorspace import rgb_to_lab


def _img_pair(rng, h=40, w=56):
    """Mid-range images unlikely to clip after transfer."""
    base = rng.uniform(0.3, 0.7, size=(h, w, 3)).astype(np.float32)
    target = np.clip(base * 0.9 + 0.05 + rng.normal(0, 0.02, base.shape), 0.2, 0.8)
    reference = np.clip(base * 1.1 - 0.02 + rng.normal(0, 0.02, base.shape), 0.2, 0.8)
    return jnp.asarray(target.astype(np.float32)), jnp.asarray(
        reference.astype(np.float32)
    )


class TestReinhard:
    def test_matches_lab_moments(self, rng):
        t, r = _img_pair(rng)
        out = methods.linear.reinhard(t, r)
        lab_out = np.asarray(rgb_to_lab(out)).reshape(-1, 3)
        lab_ref = np.asarray(rgb_to_lab(r)).reshape(-1, 3)
        np.testing.assert_allclose(lab_out.mean(0), lab_ref.mean(0), atol=5e-2)
        np.testing.assert_allclose(lab_out.std(0), lab_ref.std(0), atol=5e-2)

    def test_identity(self, rng):
        t, _ = _img_pair(rng)
        out = methods.linear.reinhard(t, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-3)

    def test_jit_and_vmap(self, rng):
        t, r = _img_pair(rng)
        batch_t = jnp.stack([t, t])
        batch_r = jnp.stack([r, r])
        out = jax.jit(jax.vmap(methods.linear.reinhard))(batch_t, batch_r)
        assert out.shape == batch_t.shape
        assert np.isfinite(np.asarray(out)).all()


class TestCorrelatedColorSpace:
    def test_matches_rgb_moments_shared_basis(self, rng):
        # Xiao's transform pairs the principal axes of the two covariances;
        # it matches the reference covariance exactly only when both share an
        # eigenbasis, so construct such a pair (distinct, well-separated
        # eigenvalues keep the eigendecomposition stable).
        u, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        z = rng.normal(size=(3000, 3))
        a = z @ (u @ np.diag([0.20, 0.10, 0.04]) @ u.T) + 0.5
        b = rng.normal(size=(3000, 3)) @ (u @ np.diag([0.12, 0.07, 0.02]) @ u.T) + 0.45
        t = jnp.asarray(a.reshape(50, 60, 3).astype(np.float32))
        r = jnp.asarray(b.reshape(50, 60, 3).astype(np.float32))
        out = np.asarray(methods.linear.correlated_color_space(t, r)).reshape(-1, 3)
        ref = np.asarray(r).reshape(-1, 3)
        np.testing.assert_allclose(out.mean(0), ref.mean(0), atol=1e-3)
        np.testing.assert_allclose(np.cov(out.T), np.cov(ref.T), atol=2e-3)

    def test_identity(self, rng):
        t, _ = _img_pair(rng)
        out = methods.linear.correlated_color_space(t, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-3)


class TestMongeKantorovitch:
    def test_matches_rgb_moments_all_decompositions(self, rng):
        t, r = _img_pair(rng)
        for decomposition in ["MK", "sqrt", "cholesky"]:
            out = np.asarray(
                methods.linear.monge_kantorovitch(t, r, decomposition=decomposition)
            ).reshape(-1, 3)
            ref = np.asarray(r).reshape(-1, 3)
            np.testing.assert_allclose(out.mean(0), ref.mean(0), atol=1e-3)
            np.testing.assert_allclose(np.cov(out.T), np.cov(ref.T), atol=1e-4)

    def test_mk_identity(self, rng):
        t, _ = _img_pair(rng)
        out = methods.linear.monge_kantorovitch(t, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(t), atol=1e-3)

    def test_mk_is_symmetric_transform(self, rng):
        # The MK map is the unique SPD linear transport plan; unlike
        # cholesky/sqrt it is symmetric. Sanity-check T's defining property
        # T cov_t T = cov_r by verifying the output covariance directly on a
        # strongly anisotropic pair.
        a = rng.normal(size=(2000, 3)) @ np.diag([0.2, 0.05, 0.01]) + 0.5
        b = rng.normal(size=(2000, 3)) @ np.array(
            [[0.1, 0.02, 0], [0.02, 0.08, 0.01], [0, 0.01, 0.05]]
        ) + 0.5
        t = jnp.asarray(a.reshape(40, 50, 3).astype(np.float32))
        r = jnp.asarray(b.reshape(40, 50, 3).astype(np.float32))
        out = np.asarray(methods.linear.monge_kantorovitch(t, r)).reshape(-1, 3)
        np.testing.assert_allclose(
            np.cov(out.T), np.cov(b.T), atol=5e-4
        )

    def test_bad_decomposition_raises(self, rng):
        t, r = _img_pair(rng)
        try:
            methods.linear.monge_kantorovitch(t, r, decomposition="bogus")
            assert False
        except ValueError:
            pass


class TestIDT:
    def test_distribution_converges(self, rng):
        t, r = _img_pair(rng)
        out = np.asarray(
            methods.iterative.iterative_distribution_transfer(t, r, n_iter=8)
        ).reshape(-1, 3)
        ref = np.asarray(r).reshape(-1, 3)
        # Per-channel quantiles should approach the reference distribution.
        for c in range(3):
            q_out = np.quantile(out[:, c], [0.1, 0.3, 0.5, 0.7, 0.9])
            q_ref = np.quantile(ref[:, c], [0.1, 0.3, 0.5, 0.7, 0.9])
            np.testing.assert_allclose(q_out, q_ref, atol=0.02)

    def test_deterministic_given_key(self, rng):
        t, r = _img_pair(rng)
        key = jax.random.PRNGKey(7)
        o1 = methods.iterative.iterative_distribution_transfer(t, r, key=key)
        o2 = methods.iterative.iterative_distribution_transfer(t, r, key=key)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_rotations_are_special_orthogonal(self):
        r = np.asarray(
            methods.iterative.random_rotations(jax.random.PRNGKey(0), 16)
        )
        for m in r:
            np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
            assert abs(np.linalg.det(m) - 1.0) < 1e-5


class TestGrading:
    def test_runs_and_preserves_structure(self, rng):
        # Large enough to build a two-level pyramid (>40 min dim).
        t, r = _img_pair(rng, h=96, w=128)
        out = np.asarray(methods.iterative.automated_color_grading(t, r))
        assert out.shape == t.shape
        assert np.isfinite(out).all()
        # Regrain preserves target gradients: correlation of spatial
        # derivative signs between target and output is high.
        gt = np.diff(np.asarray(t), axis=0).ravel()
        go = np.diff(out, axis=0).ravel()
        corr = np.corrcoef(gt, go)[0, 1]
        assert corr > 0.5


class TestRegistry:
    def test_all_registered(self):
        names = methods.available_methods()
        for n in [
            "reinhard",
            "correlated_color_space",
            "monge_kantorovitch",
            "idt",
            "automated_color_grading",
        ]:
            assert n in names

    def test_reference_func_specs_resolve(self):
        # The reference addresses methods by dotted path
        # (reference configs/others.yaml:5).
        fn = methods.get_method("methods.linear.color_transfer_between_images")
        assert fn is methods.linear.reinhard

    def test_unknown_raises(self):
        try:
            methods.get_method("nope")
            assert False
        except KeyError:
            pass


class TestXiaoOracle:
    def test_matches_float64_numpy_oracle_across_distortions(self, rng):
        """The reference Xiao implementation is pure numpy (no skimage), so
        an exact float64 oracle is available; check across the distortions
        that exercise eigen-axis pairing (saturation/hue)."""
        from color_transfer_tpu.data import distortions

        base = rng.uniform(0.1, 0.9, (48, 64, 3)).astype(np.float32)
        # Structured content so covariances are anisotropic.
        gradient = np.linspace(0, 0.3, 64)[None, :, None]
        gt = np.clip(base * 0.7 + gradient, 0, 1).astype(np.float32)
        ref = np.clip(np.roll(gt, 5, axis=1) * 0.95 + 0.02, 0, 1).astype(np.float32)

        def oracle(target, reference):
            t = target.reshape(-1, 3).astype(np.float64)
            r = reference.reshape(-1, 3).astype(np.float64)
            tm, rm = t.mean(0), r.mean(0)
            tu, ts, _ = np.linalg.svd(np.cov(t.T))
            ru, rs, _ = np.linalg.svd(np.cov(r.T))
            T = tu @ np.diag(1 / np.sqrt(ts)) @ np.diag(np.sqrt(rs)) @ np.linalg.inv(ru)
            return ((t - tm) @ T.T + rm).reshape(target.shape)

        for fn in [
            lambda x: x,
            lambda x: distortions.adjust_saturation(x, 1.3),
            lambda x: distortions.adjust_hue(x, 0.1),
            lambda x: distortions.adjust_gamma(x, 1.3),
        ]:
            target = np.asarray(fn(jnp.asarray(gt)))
            mine = np.asarray(
                methods.linear.correlated_color_space(
                    jnp.asarray(target), jnp.asarray(ref)
                )
            )
            want = oracle(target, np.asarray(ref))
            # Sign conventions may differ only when they don't matter; the
            # outputs must agree.
            assert np.abs(mine - want).max() < 5e-3


class TestSSIMBound:
    def test_ssim_never_exceeds_one(self, rng):
        from color_transfer_tpu import metrics as M

        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
        # Near-identical smooth pair — the worst case for f32 cancellation.
        from color_transfer_tpu.core.blur import gaussian_blur

        xs = gaussian_blur(x, 11, 3.0, channel_last=True)
        ys = jnp.clip(xs + 1e-4, 0, 1)
        val = float(M.ssim(xs, ys))
        assert val <= 1.0 + 1e-5


class TestMKOracle:
    def test_matches_float64_scipy_oracle(self, rng):
        """The reference MK implementation is pure numpy/scipy — compare the
        full method against an exact float64 oracle on distorted pairs."""
        import scipy.linalg
        from color_transfer_tpu.data import distortions

        base = rng.uniform(0.1, 0.9, (48, 64, 3)).astype(np.float32)
        gradient = np.linspace(0, 0.3, 64)[None, :, None]
        gt = np.clip(base * 0.7 + gradient, 0, 1).astype(np.float32)
        ref = np.clip(np.roll(gt, 5, axis=1) * 0.95 + 0.02, 0, 1).astype(np.float32)

        def oracle(target, reference):
            t = target.reshape(-1, 3).astype(np.float64)
            r = reference.reshape(-1, 3).astype(np.float64)
            tm, rm = t.mean(0), r.mean(0)
            tc, rc = np.cov(t.T), np.cov(r.T)
            a = scipy.linalg.sqrtm(tc)
            T = np.linalg.inv(a) @ scipy.linalg.sqrtm(a @ rc @ a) @ np.linalg.inv(a)
            return ((t - tm) @ T + rm).reshape(target.shape)

        for fn in [
            lambda x: x,
            lambda x: distortions.adjust_hue(x, 0.2),
            lambda x: distortions.adjust_contrast(x, 0.6),
        ]:
            target = np.asarray(fn(jnp.asarray(gt)))
            mine = np.asarray(
                methods.linear.monge_kantorovitch(jnp.asarray(target), jnp.asarray(ref))
            )
            want = oracle(target, np.asarray(ref))
            assert np.abs(mine - want).max() < 2e-3


class TestPallasApplyKernel:
    def test_matches_xla_interp_path(self, rng):
        """The fused Pallas transport-apply (interpret mode) matches the
        exact XLA einsum path within the hi/lo bf16 table-split bound:
        the selection error is the bf16 re-rounding of the lo term,
        <= 2^-18 * |table| ~= 1e-3 of a bin at 255-bin tables (see the
        _apply_kernel docstring for the round-4 precision/speed story)."""
        from color_transfer_tpu.methods import iterative as it

        d0 = jnp.asarray(
            rng.uniform(-0.5, 1.5, size=(3, 4096)).astype(np.float32)
        )
        fp = jnp.asarray(
            np.sort(rng.uniform(0, 255, size=(3, 255)), axis=1).astype(
                np.float32
            )
        )
        grid_lo = jnp.asarray([-0.4, 0.0, 0.1], jnp.float32)
        step = jnp.asarray([0.007, 0.005, 0.006], jnp.float32)
        right_edge = grid_lo + step * 254

        out_pallas = it._apply_tables_pallas(
            d0, grid_lo, step, fp, right_edge, interpret=True
        )
        out_xla = it._interp_uniform_tables(
            d0, grid_lo, step, fp, left=0.0, right=255.0,
            right_edge=right_edge,
        )
        # atol 2e-3 both admits the documented split bound AND catches the
        # XLA cast-elision degeneration (whose error is ~0.5 bin, 250x it).
        np.testing.assert_allclose(
            np.asarray(out_pallas), np.asarray(out_xla), atol=2e-3
        )


class TestRegrainStencilKernel:
    def test_pallas_sweeps_match_xla_path(self, rng):
        """ops/regrain_stencil.py must reproduce _solve's XLA fori_loop
        sweeps bit-closely for the same invariants (edge-replicate stencil,
        damping, nbit iterations)."""
        import jax.numpy as jnp
        from color_transfer_tpu.methods import iterative as it
        from color_transfer_tpu.ops.regrain_stencil import regrain_sweeps_pallas

        h, w = 13, 22  # odd sizes exercise boundary masks + lane padding
        img_in = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        img_col = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        img_out = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
        nbit, level = 7, 1

        want = it._solve(img_out, img_in, img_col, nbit, level)

        const, (p1, p2, p3, p4), invd = it._solve_invariants(
            img_in, img_col, level
        )
        phis = jnp.stack([p1[..., 0], p2[..., 0], p3[..., 0], p4[..., 0]])
        got = regrain_sweeps_pallas(
            img_out, const, phis, invd[..., 0], nbit, rho=0.2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6
        )

    def test_level_fits_vmem_policy(self):
        from color_transfer_tpu.ops.regrain_stencil import level_fits_vmem

        assert level_fits_vmem(540, 960)
        assert level_fits_vmem(34, 60)
        assert not level_fits_vmem(2160, 3840)
