"""Separable Gaussian blur with torchvision semantics.

The reference blurs with ``torchvision.transforms.functional.gaussian_blur``
(11x11, sigma=2) inside the iCID metric (reference utils/icid.py:88-115) and
with a kornia Gaussian inside SSIM. torchvision's gaussian_blur:
  * builds a 1D kernel from the *continuous* Gaussian pdf sampled at integer
    offsets, normalized to sum 1;
  * pads with reflect padding;
  * convolves separably.

Implemented as a depthwise separable convolution so XLA maps it onto fused
convolutions; channel-last (..., H, W) or (..., H, W, C) layouts supported.
"""

import math

import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(kernel_size: int, sigma: float, dtype=jnp.float32):
    """torchvision's _get_gaussian_kernel1d: softmax-free normalized pdf."""
    half = (kernel_size - 1) * 0.5
    x = jnp.linspace(-half, half, kernel_size, dtype=dtype)
    pdf = jnp.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def _reflect_pad_hw(x, pad_h, pad_w):
    """Reflect padding (no edge repeat) on the two trailing spatial axes."""
    pad = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(x, pad, mode="reflect")


def gaussian_blur(x, kernel_size=11, sigma=2.0, channel_last=False):
    """Gaussian blur over the spatial dims.

    Args:
      x: ``(..., H, W)`` array, or ``(..., H, W, C)`` when ``channel_last``.
      kernel_size: int or (kh, kw).
      sigma: float or (sh, sw).
      channel_last: set True for ``(..., H, W, C)`` input.

    Returns array of the same shape (reflect-padded "same" convolution).
    """
    if channel_last:
        x = jnp.moveaxis(x, -1, -3)  # (..., C, H, W)

    if isinstance(kernel_size, int):
        kh = kw = kernel_size
    else:
        kh, kw = kernel_size
    if isinstance(sigma, (int, float)):
        sh = sw = float(sigma)
    else:
        sh, sw = sigma

    kern_h = gaussian_kernel1d(kh, sh, x.dtype)
    kern_w = gaussian_kernel1d(kw, sw, x.dtype)

    orig_shape = x.shape
    h, w = orig_shape[-2], orig_shape[-1]

    if kh * kw <= 512:
        # Shift-add separable path: XLA's conv with a single feature channel
        # runs near-empty on the TPU conv unit (the regrain pyramid's 5-tap
        # anti-alias blurs cost ~38 ms/batch4 @1080p as convs, ~4 ms as
        # fused shifted multiply-adds). Identical math: same kernels, same
        # reflect padding.
        xp = _reflect_pad_hw(x, kh // 2, kw // 2)
        out = None
        for k in range(kh):
            term = kern_h[k] * xp[..., k : k + h, :]
            out = term if out is None else out + term
        acc = None
        for k in range(kw):
            term = kern_w[k] * out[..., :, k : k + w]
            acc = term if acc is None else acc + term
        out = acc
        if channel_last:
            out = jnp.moveaxis(out, -3, -1)
        return out

    flat = x.reshape((-1, 1, h, w))  # N, C=1, H, W — depthwise via batch

    flat = _reflect_pad_hw(flat, kh // 2, kw // 2)
    # Convolve rows then columns. Convolution vs correlation is identical for
    # symmetric Gaussian kernels.
    out = lax.conv_general_dilated(
        flat,
        kern_h.reshape(1, 1, kh, 1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = lax.conv_general_dilated(
        out,
        kern_w.reshape(1, 1, 1, kw),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out.reshape(orig_shape)
    if channel_last:
        out = jnp.moveaxis(out, -3, -1)
    return out


def gaussian_blur_sigma_only(x, sigma, truncate=4.0, channel_last=False):
    """scipy.ndimage-style Gaussian (radius = truncate*sigma), used by the
    skimage-parity anti-aliased resize (reference methods/iterative.py:68-71
    downscales with skimage.transform.resize whose anti-aliasing prefilter is
    a scipy Gaussian)."""
    radius = int(truncate * float(sigma) + 0.5)
    size = 2 * radius + 1
    return gaussian_blur(x, size, sigma, channel_last=channel_last)
