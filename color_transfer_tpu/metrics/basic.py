"""PSNR and SSIM with piq/kornia-parity semantics.

The reference logs ``piq.psnr`` / ``piq.ssim`` on every step
(reference methods/dcmcs3di.py:87-88, methods/__init__.py:32-33) and trains
with ``kornia.losses.ssim_loss`` window 11 (reference methods/dcmcs3di.py:73,
methods/dmsct.py:122). Differences between the two SSIM flavours that matter:

  * piq.ssim: pre-downsamples by ``f = max(1, round(min(H,W)/256))`` average
    pooling (official MATLAB protocol), Gaussian window 11/1.5, *valid*
    convolution (no padding), per-image mean then batch mean.
  * kornia ssim: no downsampling, Gaussian window 11/1.5, *same* convolution
    with reflect padding; ssim_loss = mean((1 - map) / 2) clamped to [0, 1].

Inputs are channel-last ``(B, H, W, C)`` in [0, 1].
"""

import jax.numpy as jnp
from jax import lax

from color_transfer_tpu.core.blur import gaussian_kernel1d, _reflect_pad_hw
from color_transfer_tpu.core.resize import avg_pool2d


def psnr(x, y, data_range=1.0, eps=1e-10):
    """Peak signal-to-noise ratio, averaged per-image like piq.psnr."""
    mse = jnp.mean((x - y) ** 2, axis=tuple(range(1, x.ndim)))
    return jnp.mean(10.0 * jnp.log10(data_range**2 / (mse + eps)))


def _gaussian_filter_nchw(x, kernel_size, sigma, padding):
    """Separable Gaussian over (N, C, H, W) with VALID or reflect-SAME pad."""
    n, c, h, w = x.shape
    k = gaussian_kernel1d(kernel_size, sigma, x.dtype)
    flat = x.reshape(n * c, 1, h, w)
    if padding == "same":
        flat = _reflect_pad_hw(flat, kernel_size // 2, kernel_size // 2)
    out = lax.conv_general_dilated(
        flat, k.reshape(1, 1, kernel_size, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = lax.conv_general_dilated(
        out, k.reshape(1, 1, 1, kernel_size), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(n, c, out.shape[-2], out.shape[-1])


def _ssim_map(x, y, kernel_size, kernel_sigma, data_range, k1, k2, padding):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # Variances/covariance from globally-centered signals: E[x^2]-E[x]^2 on
    # raw values loses enough f32 precision near-identical inputs that the
    # map exceeds 1 by ~1e-2; centering is shift-invariant for the sigma
    # terms and keeps the luminance term exact.
    a = x.mean(axis=(-2, -1), keepdims=True)
    b = y.mean(axis=(-2, -1), keepdims=True)
    xc = x - a
    yc = y - b

    mu_xc = _gaussian_filter_nchw(xc, kernel_size, kernel_sigma, padding)
    mu_yc = _gaussian_filter_nchw(yc, kernel_size, kernel_sigma, padding)
    mu_x = mu_xc + a
    mu_y = mu_yc + b
    sigma_xx = _gaussian_filter_nchw(xc * xc, kernel_size, kernel_sigma, padding) - mu_xc**2
    sigma_yy = _gaussian_filter_nchw(yc * yc, kernel_size, kernel_sigma, padding) - mu_yc**2
    sigma_xy = _gaussian_filter_nchw(xc * yc, kernel_size, kernel_sigma, padding) - mu_xc * mu_yc
    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    return ((2.0 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs


def ssim(
    x,
    y,
    kernel_size=11,
    kernel_sigma=1.5,
    data_range=1.0,
    k1=0.01,
    k2=0.03,
    downsample=True,
):
    """Structural similarity, piq.ssim parity (channel-last input)."""
    x = jnp.moveaxis(x, -1, 1)
    y = jnp.moveaxis(y, -1, 1)
    if downsample:
        f = max(1, round(min(x.shape[-2], x.shape[-1]) / 256))
        if f > 1:
            x = avg_pool2d(x, f)
            y = avg_pool2d(y, f)
    smap = _ssim_map(x, y, kernel_size, kernel_sigma, data_range, k1, k2, "valid")
    return jnp.mean(smap, axis=(1, 2, 3)).mean()


def ssim_loss(x, y, window_size=11, kernel_sigma=1.5, data_range=1.0):
    """kornia.losses.ssim_loss parity: mean((1 - ssim_map)/2), reflect-same.

    Used in both deep correctors' training losses (reference
    methods/dcmcs3di.py:73, methods/dmsct.py:122).
    """
    x = jnp.moveaxis(x, -1, 1)
    y = jnp.moveaxis(y, -1, 1)
    smap = _ssim_map(x, y, window_size, kernel_sigma, data_range, 0.01, 0.03, "same")
    return jnp.mean(jnp.clip((1.0 - smap) * 0.5, 0.0, 1.0))
