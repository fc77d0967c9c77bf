"""Qualitative-inspection panels (reference utils/visualizations.py).

Channel-last (B, H, W, 3) float [0,1] images. All jittable:
  * chess_mix — 25-px checkerboard interleaving gt/result (:9-21)
  * rgbmse / labmse / abmse — min-max-scaled error heat in the red channel
    (:31-52)
  * rgbssim — SSIM-map error in the red channel (:55-60)
"""

import jax.numpy as jnp

from color_transfer_tpu.core.colorspace import rgb_to_lab
from color_transfer_tpu.metrics.basic import _ssim_map


def chess_mix(x, y, size=25):
    """Checkerboard of two aligned images: even cells from x, odd from y."""
    h, w = x.shape[-3], x.shape[-2]
    iy = (jnp.arange(h) // size)[:, None]
    ix = (jnp.arange(w) // size)[None, :]
    take_x = ((iy + ix) % 2 == 0)[..., None]
    return jnp.where(take_x, x, y)


def minmaxscale(x, axes=(-1, -2)):
    mn = x.min(axis=axes, keepdims=True)
    mx = x.max(axis=axes, keepdims=True)
    return (x - mn) / (mx - mn + 1e-12)


def _red_channel_error(x, m):
    error = jnp.zeros_like(x)
    return error.at[..., 0].set(minmaxscale(m))


def rgbmse(x, y):
    return _red_channel_error(x, jnp.square(x - y).mean(axis=-1))


def labmse(x, y):
    # Reference quirk preserved: Lab conversion of the squared difference
    # (reference utils/visualizations.py:41).
    m = rgb_to_lab(jnp.square(x - y)).mean(axis=-1)
    return _red_channel_error(x, m)


def abmse(x, y):
    m = rgb_to_lab(jnp.square(x - y))[..., 1:].mean(axis=-1)
    return _red_channel_error(x, m)


def rgbssim(x, y):
    smap = _ssim_map(
        jnp.moveaxis(x, -1, 1), jnp.moveaxis(y, -1, 1),
        kernel_size=11, kernel_sigma=1.5, data_range=1.0, k1=0.01, k2=0.03,
        padding="same",
    )  # (B, C, H, W)
    m = 0.5 - smap.mean(axis=1) / 2.0
    return _red_channel_error(x, m)
