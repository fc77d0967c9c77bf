"""Photometric distortion synthesis, on-device.

The reference distorts the ground-truth view with torchvision ops — randomly
ordered/parameterized for training (reference utils/data.py:25-49) and a
31-function deterministic grid for testing (reference utils/data.py:12-22).
Here the ops are jittable float functions on channel-last [0,1] images, so
distortion synthesis fuses into the device-side input pipeline instead of
running in 32 DataLoader worker processes (reference configs/dcmcs3di.yaml:15).

Semantics follow torchvision.transforms.functional on float tensors:
blend-based ops clamp to [0,1]; sharpness keeps the 1-pixel border unblurred.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from color_transfer_tpu.core.colorspace import (
    rgb_to_grayscale,
    rgb_to_hsv,
    hsv_to_rgb,
)


def _blend(img1, img2, ratio):
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = jnp.mean(rgb_to_grayscale(img), axis=(-2, -1), keepdims=True)[..., None]
    return _blend(img, jnp.broadcast_to(mean, img.shape), factor)


def adjust_saturation(img, factor):
    gray = rgb_to_grayscale(img, keepdims=True)
    return _blend(img, jnp.broadcast_to(gray, img.shape), factor)


def adjust_hue(img, factor):
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + factor) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def adjust_gamma(img, gamma, gain=1.0):
    return jnp.clip(gain * jnp.maximum(img, 0.0) ** gamma, 0.0, 1.0)


_SHARP_KERNEL = (
    np.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
)


def adjust_sharpness(img, factor):
    """torchvision adjust_sharpness: blend with a fixed 3x3 blur whose
    1-pixel border is left equal to the input."""
    h, w = img.shape[-3], img.shape[-2]
    x = jnp.moveaxis(img, -1, -3)  # (..., C, H, W)
    lead = x.shape[:-2]
    flat = x.reshape((-1, 1, h, w))
    kern = jnp.asarray(_SHARP_KERNEL, dtype=img.dtype).reshape(1, 1, 3, 3)
    blurred = lax.conv_general_dilated(
        flat, kern, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    ).reshape(lead + (h, w))
    # Border stays unblurred (torchvision pastes the original border back).
    interior = jnp.zeros((h, w), dtype=bool).at[1:-1, 1:-1].set(True)
    blurred = jnp.where(interior, jnp.clip(blurred, 0.0, 1.0), x)
    return jnp.moveaxis(_blend(x, blurred, factor), -3, -1)


def apply_uniform_distortions(img, key, max_magnitude=0.5):
    """Random-order random-magnitude distortion of the gt view
    (reference utils/data.py:25-49): brightness/contrast/saturation/gamma/
    sharpness factors ~ U(1 +- max), hue ~ U(-max, +max), applied in a random
    permutation of the 6 ops.
    """
    k_perm, k_f = jax.random.split(key)
    perm = jax.random.permutation(k_perm, 6)
    f = jax.random.uniform(
        k_f, (6,), minval=1.0 - max_magnitude, maxval=1.0 + max_magnitude
    )
    hue = f[3] - 1.0  # reuse the U(1±max) draw recentred to U(±max)

    branches = [
        lambda im, f=f: adjust_brightness(im, f[0]),
        lambda im, f=f: adjust_contrast(im, f[1]),
        lambda im, f=f: adjust_saturation(im, f[2]),
        lambda im, hue=hue: adjust_hue(im, hue),
        lambda im, f=f: adjust_gamma(im, f[4]),
        lambda im, f=f: adjust_sharpness(im, f[5]),
    ]

    def body(i, im):
        return lax.switch(perm[i], branches, im)

    return lax.fori_loop(0, 6, body, img)


def setup_grid_distortions(max_magnitude=0.5, num=6):
    """The 31-function deterministic test grid (reference utils/data.py:12-22):
    identity + 5 ops x 6 magnitudes in linspace(-max, max)."""
    fns = [lambda x: x]
    for magnitude in np.linspace(-max_magnitude, max_magnitude, num):
        m = float(magnitude)
        fns.append(partial(adjust_brightness, factor=1 + m))
        fns.append(partial(adjust_contrast, factor=1 + m))
        fns.append(partial(adjust_saturation, factor=1 + m))
        fns.append(partial(adjust_hue, factor=m))
        fns.append(partial(adjust_gamma, gamma=1 + m))
    return fns
