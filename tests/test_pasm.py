"""Parallax attention + DCMCS3DI tests (torch oracle for the attention math)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from color_transfer_tpu.models import pasm
from color_transfer_tpu.models.dcmcs3di import DCMCS3DI, compute_losses


class TestOutput:
    def test_softmax_mask_cycle_vs_torch(self, rng):
        b, h, w = 2, 4, 8
        c_r2l = rng.normal(size=(b, h, w, w)).astype(np.float32)
        c_l2r = rng.normal(size=(b, h, w, w)).astype(np.float32)

        att, cycle, masks = pasm.output((jnp.asarray(c_r2l), jnp.asarray(c_l2r)))

        t_r2l = torch.softmax(torch.from_numpy(c_r2l), dim=-1)
        t_l2r = torch.softmax(torch.from_numpy(c_l2r), dim=-1)
        np.testing.assert_allclose(np.asarray(att[0]), t_r2l.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(att[1]), t_l2r.numpy(), atol=1e-6)

        want_mask_l = (t_l2r.sum(dim=-2) > 0.1).numpy()
        np.testing.assert_array_equal(np.asarray(masks[0])[..., 0], want_mask_l)

        want_cycle = torch.matmul(t_r2l, t_l2r).numpy()
        np.testing.assert_allclose(np.asarray(cycle[0]), want_cycle, atol=1e-6)

    def test_inference_flag(self, rng):
        c = jnp.asarray(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
        att, cycle, masks = pasm.output((c, c), inference=True)
        assert cycle == (None, None)
        assert masks[1] is None


class TestWarp:
    def test_vs_torch(self, rng):
        b, h, w, c = 2, 4, 8, 5
        att = rng.normal(size=(b, h, w, w)).astype(np.float32)
        img = rng.normal(size=(b, h, w, c)).astype(np.float32)
        got = np.asarray(pasm.warp(jnp.asarray(img), jnp.asarray(att)))
        want = torch.matmul(torch.from_numpy(att), torch.from_numpy(img)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identity_attention(self, rng):
        b, h, w, c = 1, 3, 6, 4
        att = jnp.broadcast_to(jnp.eye(w), (b, h, w, w))
        img = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pasm.warp(img, att)), np.asarray(img), atol=1e-6
        )


class TestRegressDisp:
    def test_full_mask_returns_expected_disp(self, rng):
        b, h, w = 1, 3, 8
        att = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, h, w, w)).astype(np.float32)), axis=-1
        )
        mask = jnp.ones((b, h, w, 1), dtype=jnp.float32)
        disp = pasm.regress_disp(att, mask)
        index = np.arange(w, dtype=np.float32)
        want = index[None, None, :] - np.einsum(
            "bhwv,v->bhw", np.asarray(att), index
        )
        np.testing.assert_allclose(np.asarray(disp)[..., 0], want, atol=1e-4)

    def test_partial_mask_inpaints(self, rng):
        b, h, w = 1, 2, 8
        att = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, h, w, w)).astype(np.float32)), axis=-1
        )
        mask = np.ones((b, h, w, 1), dtype=np.float32)
        mask[:, :, 2:5] = 0.0  # occluded band
        disp = np.asarray(pasm.regress_disp(att, jnp.asarray(mask)))
        assert np.isfinite(disp).all()


class TestLosses:
    def test_cycle_zero_at_identity(self):
        b, h, w = 1, 3, 6
        eye = jnp.broadcast_to(jnp.eye(w), (b, h, w, w))
        masks = (jnp.ones((b, h, w, 1)), jnp.ones((b, h, w, 1)))
        loss = pasm.loss_pam_cycle((eye, eye), masks)
        assert float(loss) < 1e-7

    def test_photometric_zero_for_identical_views(self, rng):
        b, h, w, c = 1, 3, 6, 3
        img = jnp.asarray(rng.uniform(0, 1, size=(b, h, w, c)).astype(np.float32))
        eye = jnp.broadcast_to(jnp.eye(w), (b, h, w, w))
        masks = (jnp.ones((b, h, w, 1)), jnp.ones((b, h, w, 1)))
        loss = pasm.loss_pam_photometric(img, img, (eye, eye), masks)
        assert float(loss) < 1e-7

    def test_smoothness_zero_for_constant(self):
        att = jnp.ones((1, 4, 6, 6)) / 6.0
        assert float(pasm.loss_pam_smoothness((att, att))) < 1e-7


class TestDCMCS3DI:
    def _tiny(self):
        return DCMCS3DI(extraction_layers=2, transfer_layers=1, channels=8)

    def test_forward_shapes(self, rng):
        model = self._tiny()
        b, h, w = 1, 8, 16
        left = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        right = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), left, right)
        out, (att, cycle, masks, warped) = model.apply(params, left, right)
        assert out.shape == (b, h, w, 3)
        assert att[0].shape == (b, h, w, w)
        assert cycle[0].shape == (b, h, w, w)
        assert masks[0].shape == (b, h, w, 1)
        assert warped.shape == (b, h, w, 3)
        assert float(out.min()) >= 0 and float(out.max()) <= 1

    def test_inference_mode(self, rng):
        model = self._tiny()
        b, h, w = 1, 8, 16
        left = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), left, left)
        out, (att, cycle, masks, _) = model.apply(params, left, left, inference=True)
        assert cycle == (None, None) and masks[1] is None

    def test_loss_and_grads(self, rng):
        model = self._tiny()
        b, h, w = 2, 8, 16
        gt = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        batch = {
            "gt": gt,
            "target": jnp.clip(gt * 1.2, 0, 1),
            "reference": jnp.clip(gt * 0.9, 0, 1),
        }
        params = model.init(jax.random.PRNGKey(0), batch["target"], batch["reference"])

        def loss_fn(p):
            out = model.apply(p, batch["target"], batch["reference"])
            total, parts = compute_losses(out, batch)
            return total, parts

        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(total))
        for name, v in parts.items():
            assert np.isfinite(float(v)), name
        leaf_norms = [
            float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
        ]
        assert sum(leaf_norms) > 0
