"""Improved color-image-difference (iCID) metric, on-device.

A JAX re-derivation of the reference's MATLAB-translated implementation
(reference utils/icid.py:28-152; original: Preiss et al., "Color-image
quality assessment: From prediction to optimization", IEEE TIP 2014). Like
the reference, no spatial prefiltering is applied (reference utils/icid.py:7).

Pipeline parity notes (reference line numbers):
  * optional downsample by ``f = round(min(H,W)/256)`` with bilinear
    align_corners=False interpolation (:60-65);
  * Lab conversion via the shared D65 formulae (:68-69 uses kornia rgb_to_lab,
    which matches core.colorspace.rgb_to_lab);
  * 11x11 sigma=2 Gaussian local moments (:88-115, torchvision gaussian_blur
    semantics = reflect padding);
  * 7 similarity maps with intent weights and exponents (:42-54, :118-143);
  * prediction = 1 - mean(prod(maps)) (:146).

Input: channel-last ``(B, H, W, 3)`` RGB in [0, 1].
"""

import jax
import jax.numpy as jnp

from color_transfer_tpu.core.blur import gaussian_blur
from color_transfer_tpu.core.colorspace import rgb_to_lab
from color_transfer_tpu.core.resize import resize_bilinear

_INTENT_WEIGHTS = {
    "perceptual": (0.002, 10.0, 10.0, 0.002, 0.002, 10.0, 10.0),
    "hue-preserving": (0.002, 10.0, 10.0, 0.002, 0.02, 10.0, 10.0),
    "chromatic": (0.002, 10.0, 10.0, 0.02, 0.02, 10.0, 10.0),
}


def icid(img1, img2, intent="perceptual", omit_maps67=False, downsampling=True,
         alpha=3, valid_hw=None):
    """``valid_hw``: optional dynamic (h_true, w_true) for bucketed eval
    (run/bucketing.py) — the final mean then covers only the true region
    (the 11x11 blur band at the pad boundary remains an approximation)."""
    if intent not in _INTENT_WEIGHTS:
        raise ValueError(
            "Intent should be either 'perceptual', 'hue-preserving', or 'chromatic'"
        )
    w = _INTENT_WEIGHTS[intent]
    kernel_size, sigma = 11, 2.0

    if downsampling:
        h, wd = img1.shape[-3], img1.shape[-2]
        f = max(1, round(min(h, wd) / 256))
        if f > 1 and valid_hw is not None:
            valid_hw = (valid_hw[0] // f, valid_hw[1] // f)
        if f > 1:
            # reference utils/icid.py:64-65 — torch interpolate with
            # scale_factor=1/f: output size floor(dim / f).
            out_hw = (h // f, wd // f)
            img1 = jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(img1, -1, 1), out_hw), 1, -1
            )
            img2 = jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(img2, -1, 1), out_hw), 1, -1
            )

    lab1 = rgb_to_lab(img1)
    lab2 = rgb_to_lab(img2)

    def blur(x):
        return gaussian_blur(x, kernel_size, sigma)

    l1, a1, b1 = lab1[..., 0], lab1[..., 1], lab1[..., 2]
    l2, a2, b2 = lab2[..., 0], lab2[..., 1], lab2[..., 2]
    c1 = jnp.sqrt(a1**2 + b1**2)
    c2 = jnp.sqrt(a2**2 + b2**2)

    # Shift the channels by their global means before computing local
    # moments: local mean/std/cov are shift-invariant, but evaluating
    # E[x^2]-E[x]^2 on raw Lab magnitudes (~50-100) loses ~3 decimal digits
    # to cancellation in f32 (the reference's torch implementation has the
    # same hazard — its `.real` guard at utils/icid.py:150 exists because of
    # it). Centering keeps every map in [0, 1] up to true rounding noise.
    l1c = l1 - jnp.mean(l1, axis=(-2, -1), keepdims=True)
    l2c = l2 - jnp.mean(l2, axis=(-2, -1), keepdims=True)
    c1c = c1 - jnp.mean(c1, axis=(-2, -1), keepdims=True)
    c2c = c2 - jnp.mean(c2, axis=(-2, -1), keepdims=True)

    mu_l1, mu_c1 = blur(l1), blur(c1)
    mu_l2, mu_c2 = blur(l2), blur(c2)
    mu_l1c, mu_c1c = blur(l1c), blur(c1c)
    mu_l2c, mu_c2c = blur(l2c), blur(c2c)

    def std(xc, muc):
        v = blur(xc**2) - muc**2
        return jnp.sqrt(jnp.maximum(v, 0.0))

    s_l1, s_l2 = std(l1c, mu_l1c), std(l2c, mu_l2c)
    s_c1, s_c2 = std(c1c, mu_c1c), std(c2c, mu_c2c)

    dl_sq = (mu_l1 - mu_l2) ** 2
    dc_sq = (mu_c1 - mu_c2) ** 2
    hue = jnp.maximum((a1 - a2) ** 2 + (b1 - b2) ** 2 - (c1 - c2) ** 2, 0.0)
    dh_sq = blur(jnp.sqrt(hue)) ** 2
    s_l12 = blur(l1c * l2c) - mu_l1c * mu_l2c
    s_c12 = blur(c1c * c2c) - mu_c1c * mu_c2c

    maps = [
        1.0 / (w[0] * dl_sq + 1.0),
        (w[1] + 2.0 * s_l1 * s_l2) / (w[1] + s_l1**2 + s_l2**2),
        ((w[2] + jnp.abs(s_l12)) / (w[2] + s_l1 * s_l2)) ** alpha,
        1.0 / (w[3] * dc_sq + 1.0),
        1.0 / (w[4] * dh_sq + 1.0),
        (w[5] + 2.0 * s_c1 * s_c2) / (w[5] + s_c1**2 + s_c2**2),
        (w[6] + jnp.abs(s_c12)) / (w[6] + s_c1 * s_c2),
    ]
    if omit_maps67:
        # reference utils/icid.py:52 zeroes the exponents of maps 6-7.
        maps = maps[:5]

    prod = maps[0]
    for m in maps[1:]:
        prod = prod * m
    if valid_hw is None:
        return 1.0 - jnp.mean(prod)
    h_t, w_t = valid_hw
    mh, mw = prod.shape[-2], prod.shape[-1]
    ih = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1)
    mask = ((ih < h_t) & (iw < w_t)).astype(prod.dtype)
    total = jnp.sum(prod * mask)
    count = prod.shape[0] * h_t * w_t
    return 1.0 - total / count
