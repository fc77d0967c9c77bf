"""Unit tests for the numeric core against numpy/scipy/torch oracles.

The reference's own CPU implementations (skimage/kornia/torchvision) are not
installed in this image, but torch and scipy are; torch.nn.functional provides
exact oracles for interpolate/grid_sample/avg_pool semantics, scipy for
Gaussian filtering and sqrtm, and the CIE Lab formulae have well-known golden
values (identical math in skimage and kornia — reference methods/linear.py:25,
utils/icid.py:68).
"""

import numpy as np
import pytest
import scipy.linalg
import scipy.ndimage
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from color_transfer_tpu import core


class TestColorspace:
    def test_lab_golden_values(self):
        # CIE Lab golden values for sRGB primaries under D65/2deg.
        rgb = jnp.array(
            [[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
        )
        lab = np.asarray(core.rgb_to_lab(rgb))
        expected = np.array(
            [
                [100.0, 0.0, 0.0],
                [0.0, 0.0, 0.0],
                [53.2408, 80.0925, 67.2032],
                [87.7347, -86.1827, 83.1793],
                [32.2970, 79.1875, -107.8602],
            ]
        )
        np.testing.assert_allclose(lab, expected, atol=2e-2)

    def test_lab_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0.05, 0.95, size=(17, 13, 3)).astype(np.float32))
        back = core.lab_to_rgb(core.rgb_to_lab(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-5)

    def test_hsv_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(0, 1, size=(50, 3)).astype(np.float32))
        back = core.hsv_to_rgb(core.rgb_to_hsv(rgb))
        np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)

    def test_grayscale_weights(self):
        gray = core.rgb_to_grayscale(jnp.array([0.5, 0.5, 0.5]))
        np.testing.assert_allclose(float(gray), 0.5 * (0.2989 + 0.587 + 0.114), atol=1e-6)


class TestBlur:
    def test_matches_scipy_gaussian(self, rng):
        x = rng.uniform(0, 1, size=(32, 48)).astype(np.float32)
        got = np.asarray(core.gaussian_blur(jnp.asarray(x), 11, 2.0))
        # scipy truncate=2.5 -> radius 5 -> 11 taps; mode='mirror' == reflect.
        want = scipy.ndimage.gaussian_filter(x, sigma=2.0, truncate=2.5, mode="mirror")
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_kernel_normalized(self):
        k = np.asarray(core.gaussian_kernel1d(11, 1.5))
        assert abs(k.sum() - 1.0) < 1e-6


class TestResize:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("out_hw", [(16, 24), (37, 11), (64, 96)])
    def test_bilinear_matches_torch(self, rng, align_corners, out_hw):
        x = rng.uniform(0, 1, size=(2, 3, 32, 48)).astype(np.float32)
        got = np.asarray(
            core.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
        )
        want = F.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nearest_matches_torch(self, rng):
        # (20,30)->(10,15) rides the strided exact-factor fast path;
        # (20,30)->(7,11) the general gather path — both must be bitwise
        # torch-'nearest'.
        x = rng.uniform(0, 1, size=(1, 1, 20, 30)).astype(np.float32)
        for out_hw in ((10, 15), (7, 11)):
            got = np.asarray(core.resize_nearest(jnp.asarray(x), out_hw))
            want = F.interpolate(
                torch.from_numpy(x), size=out_hw, mode="nearest"
            ).numpy()
            np.testing.assert_allclose(got, want, atol=0)

    def test_avg_pool_matches_torch(self, rng):
        x = rng.uniform(0, 1, size=(2, 3, 33, 47)).astype(np.float32)
        got = np.asarray(core.avg_pool2d(jnp.asarray(x), 4))
        want = F.avg_pool2d(torch.from_numpy(x), kernel_size=4).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_derive_matcher_size(self):
        from color_transfer_tpu.core.resize import derive_matcher_size

        # Small inputs: just round up to x32.
        assert derive_matcher_size(160, 320) == (160, 320)
        assert derive_matcher_size(150, 300) == (160, 320)
        # 1080p: aspect 16/9 -> max_h = floor(sqrt(450000*9/16)) = 503,
        # max_w = floor(503*16/9) = 894 -> rounded (512, 896).
        assert derive_matcher_size(1080, 1920) == (512, 896)


class TestSampling:
    def test_grid_sample_matches_torch_zeros(self, rng):
        img = rng.uniform(0, 1, size=(12, 17, 3)).astype(np.float32)
        # Coordinates straddling the border to exercise the zeros mask.
        coords = rng.uniform(-3, 20, size=(9, 11, 2)).astype(np.float32)
        got = np.asarray(core.grid_sample(jnp.asarray(img), jnp.asarray(coords)))

        timg = torch.from_numpy(img).permute(2, 0, 1)[None]
        h, w = img.shape[:2]
        norm = (coords / np.array([(w - 1) / 2.0, (h - 1) / 2.0]) - 1.0).astype(np.float32)
        tgrid = torch.from_numpy(norm)[None]
        want = (
            F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="zeros", align_corners=True)[0]
            .permute(1, 2, 0)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_flow_warp_identity(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, size=(8, 9, 2)).astype(np.float32))
        out = core.flow_warp(img, jnp.zeros((8, 9, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_fb_consistency(self):
        from color_transfer_tpu.core.sampling import forward_backward_consistency

        fwd = jnp.zeros((6, 7, 2))
        occ_f, occ_b = forward_backward_consistency(fwd, fwd)
        assert float(occ_f.sum()) == 0.0 and float(occ_b.sum()) == 0.0


class TestLinalg:
    def test_sqrtm_matches_scipy(self, rng):
        x = rng.normal(size=(100, 3)).astype(np.float64)
        c = np.cov(x.T)
        got = np.asarray(core.sqrtm_psd(jnp.asarray(c, dtype=jnp.float32)))
        want = scipy.linalg.sqrtm(c).real
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_cov3_matches_numpy(self, rng):
        x = rng.normal(size=(257, 3)).astype(np.float32)
        got = np.asarray(core.cov3(jnp.asarray(x)))
        want = np.cov(x.T)
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestReviewRegressions:
    def test_srgb_to_linear_grad_finite_below_gamut(self):
        """s < -0.055 made the unselected power branch NaN and poisoned the
        where-VJP (0 * nan): gradients through rgb_to_lab on unclipped
        predictions must stay finite."""
        import jax

        from color_transfer_tpu.core import colorspace

        g = jax.grad(lambda s: jnp.sum(colorspace.srgb_to_linear(s)))(
            jnp.asarray([-0.1, 0.0, 0.02, 0.5])
        )
        assert np.isfinite(np.asarray(g)).all()

    def test_resize_align_corners_out_size_one_torch_parity(self):
        """torch F.interpolate(align_corners=True) with out=1 selects index
        0, not the half-pixel center."""
        import torch
        import torch.nn.functional as F
        from color_transfer_tpu.core.resize import resize_bilinear

        x = np.random.RandomState(0).rand(1, 2, 4).astype(np.float32)
        ours = resize_bilinear(jnp.asarray(x), (1, 4), align_corners=True)
        theirs = F.interpolate(
            torch.from_numpy(x)[None], size=(1, 4), mode="bilinear",
            align_corners=True,
        )[0]
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-6
        )
