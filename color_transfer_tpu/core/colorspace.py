"""Color-space conversions, all jittable and channel-last.

Semantics match the conversions the reference relies on:
  * sRGB <-> CIE Lab with D65/2deg white point — the reference's classical
    methods use skimage rgb2lab/lab2rgb (reference methods/linear.py:25-26,:40)
    and its iCID metric uses kornia rgb_to_lab (reference utils/icid.py:68-69);
    both implement the same CIE formulae reproduced here.
  * RGB <-> HSV and RGB -> grayscale follow torchvision's definitions, used by
    the distortion synthesis (reference utils/data.py:25-49).
  * RGB -> YIQ is required by the FSIM metric (piq parity).

All functions take arrays whose last axis is the channel axis (size 3) and
operate in float32 by default. Inputs are in [0, 1] unless noted.
"""

import numpy as np

import jax.numpy as jnp
from jax import lax


def _matmul3(x, m):
    """(..., 3) @ (3, 3)^T in full float32 — these 3x3 color matrices feed
    quality metrics, so they must not drop to the TPU's default bf16 matmul
    precision."""
    return jnp.matmul(x, m.T, precision=lax.Precision.HIGHEST)

# skimage's xyz_from_rgb matrix (CIE RGB->XYZ under D65). Constants stay
# host-side numpy — module import must not initialize a JAX backend (XLA
# folds them at trace time anyway).
_RGB_TO_XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float32,
)

_XYZ_TO_RGB = np.linalg.inv(_RGB_TO_XYZ)

# D65 / 2deg observer reference white, as used by skimage and kornia.
_D65_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)

_LAB_DELTA = 6.0 / 29.0  # cube root of 0.008856...
_LAB_T0 = _LAB_DELTA**3  # 0.008856 threshold


def srgb_to_linear(s):
    """sRGB electro-optical transfer function (gamma expand)."""
    s = jnp.asarray(s)
    # Guard the fractional power: for s < -0.055 the unselected branch's
    # base goes negative and its NaN poisons the where-VJP (0 * nan).
    safe = jnp.maximum((s + 0.055) / 1.055, 1e-12)
    return jnp.where(s <= 0.04045, s / 12.92, safe**2.4)


def linear_to_srgb(l):  # noqa: E741
    """Inverse sRGB EOTF (gamma compress)."""
    l = jnp.asarray(l)  # noqa: E741
    # Guard the fractional power against negative inputs under autodiff.
    safe = jnp.maximum(l, 1e-12)
    return jnp.where(l <= 0.0031308, 12.92 * l, 1.055 * safe ** (1 / 2.4) - 0.055)


def rgb_to_xyz(rgb):
    return _matmul3(srgb_to_linear(rgb), _RGB_TO_XYZ)


def xyz_to_rgb(xyz):
    return linear_to_srgb(_matmul3(xyz, _XYZ_TO_RGB))


def _lab_f(t):
    safe = jnp.maximum(t, 1e-12)
    return jnp.where(t > _LAB_T0, jnp.cbrt(safe), t / (3 * _LAB_DELTA**2) + 4.0 / 29.0)


def rgb_to_lab(rgb):
    """sRGB in [0,1] -> CIE Lab (L in [0,100], a/b roughly [-128,127]).

    Matches skimage.color.rgb2lab and kornia.color.rgb_to_lab (both D65/2deg).
    """
    xyz = rgb_to_xyz(rgb) / _D65_WHITE
    f = _lab_f(xyz)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab):
    """Inverse of :func:`rgb_to_lab`; output clipped to [0, 1] like skimage."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = a / 500.0 + fy
    fz = fy - b / 200.0
    f = jnp.stack([fx, fy, fz], axis=-1)
    xyz = jnp.where(f > _LAB_DELTA, f**3, 3 * _LAB_DELTA**2 * (f - 4.0 / 29.0))
    # skimage clips negative Z from numerical noise before converting back.
    xyz = jnp.maximum(xyz * _D65_WHITE, 0.0)
    return jnp.clip(xyz_to_rgb(xyz), 0.0, 1.0)


def rgb_to_hsv(rgb):
    """RGB -> HSV with H, S, V all in [0, 1] (torchvision convention)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(maxc == 0, ones, maxc)
    cr_div = jnp.where(cr == 0, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    h = jnp.where(
        maxc == r,
        bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(cr == 0, jnp.zeros_like(h), h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """HSV (all in [0,1]) -> RGB, torchvision convention."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_grayscale(rgb, keepdims=False):
    """ITU-R 601-2 luma transform, torchvision's rgb_to_grayscale weights."""
    gray = rgb[..., 0] * 0.2989 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    if keepdims:
        gray = gray[..., None]
    return gray


_RGB_TO_YIQ = np.array(
    [
        [0.299, 0.587, 0.114],
        [0.5959, -0.2746, -0.3213],
        [0.2115, -0.5227, 0.3112],
    ],
    dtype=np.float32,
)


def rgb_to_yiq(rgb):
    """RGB -> YIQ (NTSC), the luminance/chromatic split used by FSIMc."""
    return _matmul3(rgb, _RGB_TO_YIQ)
