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


class TestDepthGeometry:
    """Depth/pose helpers (reference unimatch/geometry.py:102-198) against
    analytic oracles."""

    def _intrinsics(self, fx=20.0, fy=18.0, cx=7.5, cy=3.5):
        return jnp.asarray(
            [[[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]]], dtype=jnp.float32
        )

    def test_back_project_reproject_round_trip(self, rng):
        import jax.numpy as jnp
        h, w = 8, 16
        depth = jnp.asarray(
            rng.uniform(1.0, 5.0, (1, h, w)).astype(np.float32)
        )
        K = self._intrinsics()
        pts = gx.back_project(depth, K)
        assert pts.shape == (1, h, w, 3)
        np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(depth),
                                   rtol=1e-5)
        coords = gx.reproject(pts, K)
        from color_transfer_tpu.core.sampling import coords_grid
        np.testing.assert_allclose(
            np.asarray(coords[0]), np.asarray(coords_grid(h, w)),
            atol=1e-3,
        )

    def test_identity_pose_gives_zero_rigid_flow(self, rng):
        h, w = 6, 10
        depth = jnp.asarray(rng.uniform(1.0, 5.0, (1, h, w)).astype(np.float32))
        K = self._intrinsics()
        eye = jnp.eye(4, dtype=jnp.float32)[None]
        flow, mask = gx.compute_flow_with_depth_pose(
            depth, K, extrinsics_ref=eye, extrinsics_tgt=eye, return_mask=True
        )
        np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-3)
        # Boundary pixels sit exactly on the mask threshold; float rounding
        # (y = 0 - eps) can flip them — torch float32 behaves the same.
        assert np.asarray(mask)[:, 1:-1, 1:-1].all()

    def test_translation_pose_flow_is_parallax(self, rng):
        """Pure x-translation t at constant depth d: flow_x = fx * t / d
        (classic stereo parallax), flow_y = 0."""
        h, w, d_const, tx = 6, 10, 2.0, 0.5
        depth = jnp.full((1, h, w), d_const, jnp.float32)
        K = self._intrinsics(fx=20.0)
        rel = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(tx)[None]
        flow = gx.compute_flow_with_depth_pose(depth, K, extrinsics_rel=rel)
        np.testing.assert_allclose(
            np.asarray(flow[..., 0]), 20.0 * tx / d_const, rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(flow[..., 1]), 0.0, atol=1e-4)

    def test_camera_transform_matches_rel_composition(self, rng):
        pts = jnp.asarray(rng.normal(size=(1, 4, 5, 3)).astype(np.float32))
        # A valid rigid extrinsic pair: rotation about z + translations.
        c, s = np.cos(0.3), np.sin(0.3)
        rot = np.array(
            [[c, -s, 0, 0.2], [s, c, 0, -0.1], [0, 0, 1, 0.4], [0, 0, 0, 1]],
            dtype=np.float32,
        )
        ref = jnp.asarray(rot)[None]
        tgt = jnp.eye(4, dtype=jnp.float32)[None]
        out1 = gx.camera_transform(pts, extrinsics_ref=ref, extrinsics_tgt=tgt)
        rel = jnp.einsum("bij,bjk->bik", tgt, jnp.linalg.inv(ref))
        out2 = gx.camera_transform(pts, extrinsics_rel=rel)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-4, atol=1e-5)


class TestDepthMatching:
    """Plane-sweep depth matching (reference unimatch/matching.py:206-282)."""

    def _setup(self, rng, b=1, h=6, w=10, c=8, d=4):
        f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        K = jnp.asarray(
            [[[12.0, 0, (w - 1) / 2], [0, 12.0, (h - 1) / 2], [0, 0, 1.0]]],
            dtype=jnp.float32,
        )
        return f1, K

    def test_identity_pose_warp_is_identity_at_every_depth(self, rng):
        f1, K = self._setup(rng)
        b, h, w, c = f1.shape
        pose = jnp.eye(4, dtype=jnp.float32)[None]
        depth = jnp.asarray(
            rng.uniform(1.0, 4.0, (b, 3, h, w)).astype(np.float32)
        )
        warped = gx.warp_with_pose_depth_candidates(f1, K, pose, depth)
        assert warped.shape == (b, 3, h, w, c)
        for di in range(3):
            np.testing.assert_allclose(
                np.asarray(warped[:, di]), np.asarray(f1), atol=1e-4
            )

    def test_translation_pose_warp_matches_flow_warp(self, rng):
        """x-translation at depth d == backward flow warp by fx*tx/d."""
        from color_transfer_tpu.core.sampling import flow_warp

        f1, K = self._setup(rng)
        b, h, w, c = f1.shape
        tx, d_const = 0.3, 2.0
        pose = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(tx)[None]
        depth = jnp.full((b, 1, h, w), d_const, jnp.float32)
        warped = gx.warp_with_pose_depth_candidates(f1, K, pose, depth)
        flow = jnp.full((h, w, 2), 0.0).at[..., 0].set(12.0 * tx / d_const)
        want = flow_warp(f1[0], flow)
        np.testing.assert_allclose(
            np.asarray(warped[0, 0]), np.asarray(want), atol=1e-4
        )

    def test_correlation_softmax_depth_uniform_when_pose_identity(self, rng):
        f1, K = self._setup(rng)
        b, h, w, c = f1.shape
        f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        pose = jnp.eye(4, dtype=jnp.float32)[None]
        # Inverse-depth candidates (the reference feeds inverse depths).
        cands = jnp.stack(
            [jnp.full((h, w), 1.0 / z, jnp.float32) for z in (1.0, 2.0, 4.0)]
        )[None]
        depth, prob = gx.correlation_softmax_depth(f0, f1, K, pose, cands)
        # Identity pose -> every candidate warps identically -> uniform prob
        # and the regressed (inverse) depth is the candidate mean.
        np.testing.assert_allclose(np.asarray(prob), 1.0 / 3, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(depth[:, 0]),
            float(np.mean([1.0, 0.5, 0.25])),
            rtol=1e-5,
        )
        # argmax path returns one of the candidates
        d2, _ = gx.correlation_softmax_depth(
            f0, f1, K, pose, cands, depth_from_argmax=True
        )
        assert np.isin(
            np.round(np.unique(np.asarray(d2)), 4),
            np.round(np.array([1.0, 0.5, 0.25]), 4),
        ).all()

    def test_bidir_depth_shapes_and_symmetry(self, rng):
        f1, K = self._setup(rng)
        b, h, w, c = f1.shape
        f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        pose = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.2)[None]
        cands = jnp.full((b, 2, h, w), 0.5, jnp.float32)
        depth, prob = gx.correlation_softmax_depth(
            f0, f1, K, pose, cands, pred_bidir_depth=True
        )
        assert depth.shape == (2 * b, 1, h, w)
        assert prob.shape == (2 * b, 2, h, w)
        # Backward direction == forward with swapped features + inverse pose.
        d_bwd, _ = gx.correlation_softmax_depth(
            f1, f0, K, jnp.linalg.inv(pose), cands
        )
        np.testing.assert_allclose(
            np.asarray(depth[b:]), np.asarray(d_bwd), rtol=1e-5, atol=1e-6
        )
