"""GMFlow/UniMatch component tests with torch oracles for the tensor
plumbing (unfold, convex upsampling, window split) plus shape/finite checks
for the assembled matcher on tiny inputs."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from color_transfer_tpu.models import gmflow


class TestWindows:
    def test_split_merge_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
        back = gmflow.merge_windows(gmflow.split_windows(x, 2), 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_split_matches_torch_view(self, rng):
        x = rng.normal(size=(1, 4, 6, 3)).astype(np.float32)
        got = np.asarray(gmflow.split_windows(jnp.asarray(x), 2))
        t = torch.from_numpy(x)
        b, h, w, c = t.shape
        want = (
            t.view(b, 2, h // 2, 2, w // 2, c)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(-1, h // 2, w // 2, c)
            .numpy()
        )
        np.testing.assert_array_equal(got, want)


class TestUnfold:
    def test_matches_torch_unfold(self, rng):
        x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
        got = np.asarray(gmflow._unfold_nhwc(jnp.asarray(x), 3))  # (B,H,W,9,C)
        t = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        want = F.unfold(t, kernel_size=3, padding=1)  # (B, C*9, H*W)
        want = want.view(2, 3, 9, 5, 7).permute(0, 3, 4, 2, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestConvexUpsample:
    def test_matches_torch_reference(self, rng):
        b, h, w, k = 1, 4, 6, 4
        flow = rng.normal(size=(b, h, w, 2)).astype(np.float32)
        mask = rng.normal(size=(b, h, w, 9 * k * k)).astype(np.float32)

        got = np.asarray(
            gmflow.upsample_flow_with_mask(jnp.asarray(flow), jnp.asarray(mask), k)
        )

        # torch oracle implementing reference unimatch/utils.py:137-155
        tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
        tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
        m = tmask.view(b, 1, 9, k, k, h, w)
        m = torch.softmax(m, dim=2)
        up = F.unfold(k * tflow, [3, 3], padding=1)
        up = up.view(b, 2, 9, 1, 1, h, w)
        up = torch.sum(m * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, k * h, k * w)
        want = up.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestCorrelation:
    def test_global_softmax_identity_features(self, rng):
        # Strongly distinctive per-position features -> argmax at identity
        # -> flow ~ 0.
        b, h, w, c = 1, 4, 6, 32
        feat = rng.normal(size=(b, h, w, c)).astype(np.float32) * 10
        flow, prob = gmflow.global_correlation_softmax(
            jnp.asarray(feat), jnp.asarray(feat)
        )
        assert np.abs(np.asarray(flow)).max() < 0.05
        np.testing.assert_allclose(
            np.asarray(prob).sum(-1), np.ones((b, h * w)), atol=1e-5
        )

    def test_global_bidir_block_layout(self, rng):
        b, h, w, c = 2, 3, 5, 16
        f0 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 5
        f1 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 5
        flow_bi, _ = gmflow.global_correlation_softmax(
            jnp.asarray(f0), jnp.asarray(f1), pred_bidir_flow=True
        )
        fwd, _ = gmflow.global_correlation_softmax(jnp.asarray(f0), jnp.asarray(f1))
        bwd, _ = gmflow.global_correlation_softmax(jnp.asarray(f1), jnp.asarray(f0))
        np.testing.assert_allclose(np.asarray(flow_bi[:b]), np.asarray(fwd), atol=1e-5)
        np.testing.assert_allclose(np.asarray(flow_bi[b:]), np.asarray(bwd), atol=1e-5)

    def test_local_softmax_shift_recovery(self, rng):
        # feature1 = feature0 shifted right by 2 px -> flow_x ~ +2 inside.
        b, h, w, c = 1, 8, 16, 24
        f0 = rng.normal(size=(b, h, w, c)).astype(np.float32) * 8
        f1 = np.roll(f0, shift=2, axis=2)
        flow, _ = gmflow.local_correlation_softmax(
            jnp.asarray(f0), jnp.asarray(f1), local_radius=4
        )
        inner = np.asarray(flow)[:, 2:-2, 4:-4]
        np.testing.assert_allclose(inner[..., 0], 2.0, atol=0.1)
        np.testing.assert_allclose(inner[..., 1], 0.0, atol=0.1)


class TestAssembled:
    def test_unimatch_forward_shapes(self, rng):
        model = gmflow.UniMatchFlow(num_transformer_layers=1)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img0, img1, num_reg_refine=1)
        flow = model.apply(variables, img0, img1, num_reg_refine=2)
        assert flow.shape == (1, 32, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_gmflow_wrapper_bidir_occ(self, rng):
        model = gmflow.GMFlow(inference_size=(32, 64))
        img0 = jnp.asarray(rng.uniform(0, 255, (1, 30, 50, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 30, 50, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img0, img1)
        out = model.apply(variables, img0, img1)
        assert out["flow"].shape == (1, 30, 50, 2)
        assert out["flow_bwd"].shape == (1, 30, 50, 2)
        assert out["fwd_occ"].shape == (1, 30, 50, 1)
        occ = np.asarray(out["fwd_occ"])
        assert ((occ == 0) | (occ == 1)).all()


class TestComputeDtype:
    def test_bf16_compute_path_close_to_f32(self, rng):
        """The bf16 backbone/transformer path (configs/dmsct.yaml throughput
        settings) must stay close to the f32 default on the same weights —
        flow math, softmaxes and accumulation are pinned f32 by design."""
        from color_transfer_tpu.models.gmflow import GMFlow

        f32 = GMFlow(num_transformer_layers=1, num_reg_refine=1,
                     inference_size=(32, 32))
        bf16 = GMFlow(num_transformer_layers=1, num_reg_refine=1,
                      inference_size=(32, 32), compute_dtype=jnp.bfloat16,
                      corr_dtype=jnp.bfloat16)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        variables = f32.init(jax.random.PRNGKey(0), img0, img1)

        out_a = f32.apply(variables, img0, img1)
        out_b = bf16.apply(variables, img0, img1)
        flow_a = np.asarray(out_a["flow"])
        flow_b = np.asarray(out_b["flow"])
        assert flow_b.dtype == np.float32  # flow stays f32
        assert np.isfinite(flow_b).all()
        # Random weights amplify dtype noise through the softmax argmaxes;
        # the gate here is "same flow field character", the quality gate on
        # real weights is the mini 31-distortion protocol (PERF.md).
        scale = np.abs(flow_a).mean() + 1e-3
        assert np.abs(flow_a - flow_b).mean() / scale < 0.35

    def test_refine32_tracks_f32_closer_than_full_bf16(self, rng):
        """The selective recipe (refine_dtype=f32: bf16 confined to the
        backbone/transformer, all flow arithmetic — correlation expectation,
        self-attn propagation, GRU loop incl. local corr — pinned f32) must
        engage (differ from full-bf16) and track the f32 flow at least as
        closely as the full-bf16 recipe on the same weights."""
        from color_transfer_tpu.models.gmflow import GMFlow

        kwargs = dict(num_transformer_layers=1, num_reg_refine=2,
                      inference_size=(32, 32))
        f32 = GMFlow(**kwargs)
        full = GMFlow(**kwargs, compute_dtype=jnp.bfloat16,
                      corr_dtype=jnp.bfloat16)
        sel = GMFlow(**kwargs, compute_dtype=jnp.bfloat16,
                     corr_dtype=jnp.bfloat16, refine_dtype=jnp.float32)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        variables = jax.jit(f32.init)(jax.random.PRNGKey(0), img0, img1)

        flow_f32 = np.asarray(jax.jit(f32.apply)(variables, img0, img1)["flow"])
        flow_full = np.asarray(jax.jit(full.apply)(variables, img0, img1)["flow"])
        flow_sel = np.asarray(jax.jit(sel.apply)(variables, img0, img1)["flow"])
        assert flow_sel.dtype == np.float32
        assert np.isfinite(flow_sel).all()
        assert not np.array_equal(flow_sel, flow_full)  # the knob engages
        err_sel = np.abs(flow_sel - flow_f32).mean()
        err_full = np.abs(flow_full - flow_f32).mean()
        assert err_sel <= err_full * 1.05, (err_sel, err_full)

    def test_f32_default_unchanged_by_dtype_plumbing(self, rng):
        """compute_dtype=None must be the exact f32 path (parity tests and
        checkpoint ports rely on it)."""
        from color_transfer_tpu.models.gmflow import GMFlow

        a = GMFlow(num_transformer_layers=1, num_reg_refine=1,
                   inference_size=(32, 32))
        b = GMFlow(num_transformer_layers=1, num_reg_refine=1,
                   inference_size=(32, 32), compute_dtype=None)
        img0 = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32))
        variables = a.init(jax.random.PRNGKey(0), img0, img1)
        np.testing.assert_array_equal(
            np.asarray(a.apply(variables, img0, img1)["flow"]),
            np.asarray(b.apply(variables, img0, img1)["flow"]),
        )
