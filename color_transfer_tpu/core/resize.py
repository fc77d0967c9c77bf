"""Resize primitives with PyTorch / skimage parity.

The reference resizes in several places with distinct semantics, all of which
must be reproduced to avoid silent metric drift (SURVEY.md §7 "hard parts" #2):
  * ``F.interpolate(mode='bilinear', align_corners=True)`` — GMFlow pre/post
    resize (reference unimatch/__init__.py:106-110,:129-133) and flow
    upsampling (reference unimatch/unimatch.py:157).
  * ``F.interpolate(mode='bilinear')`` (align_corners=False) — iCID
    downsampling (reference utils/icid.py:64-65).
  * ``F.interpolate(mode='nearest')`` — occlusion-mask pyramid
    (reference methods/dmsct.py:108).
  * ``skimage.transform.resize`` (bilinear, anti-aliased on downscale) — the
    regrain pyramid (reference methods/iterative.py:68-71).
  * ``F.avg_pool2d`` — the f-fold pre-pool inside piq's SSIM/FSIM.

All functions operate on the two trailing axes of ``(..., H, W)`` arrays
(move channels out of the way first) and are jittable with static out sizes.
"""

import jax.numpy as jnp
from jax import lax

from color_transfer_tpu.core.blur import gaussian_blur


def _axis_resize_bilinear(x, out_size, axis, align_corners):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        # out_size == 1: torch F.interpolate(align_corners=True) selects
        # index 0 (NOT the half-pixel center the False formula would give).
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        scale = in_size / out_size
        src = jnp.clip((dst + 0.5) * scale - 0.5, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    w1 = src - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    g0 = jnp.take(x, i0, axis=axis)
    g1 = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    return g0 * w0.reshape(shape).astype(x.dtype) + g1 * w1.reshape(shape).astype(x.dtype)


def resize_bilinear(x, out_hw, align_corners=False):
    """Bilinear resize of the two trailing axes, torch interpolate parity."""
    out_h, out_w = out_hw
    x = _axis_resize_bilinear(x, out_h, x.ndim - 2, align_corners)
    x = _axis_resize_bilinear(x, out_w, x.ndim - 1, align_corners)
    return x


def resize_nearest(x, out_hw):
    """Nearest resize of the two trailing axes, torch 'nearest' parity
    (src index = floor(dst * in/out)).

    Exact integer downscale factors take a strided slice instead of two
    axis gathers — bit-identical (floor(dst*in/out) == dst*f when
    in == out*f) and descriptor-free on TPU (DMSCT's occlusion pyramid
    rides this: the x16-padded dims divide exactly)."""
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    if in_h % out_h == 0 and in_w % out_w == 0:
        return x[..., :: in_h // out_h, :: in_w // out_w]
    iy = jnp.minimum((jnp.arange(out_h) * in_h) // out_h, in_h - 1).astype(jnp.int32)
    ix = jnp.minimum((jnp.arange(out_w) * in_w) // out_w, in_w - 1).astype(jnp.int32)
    x = jnp.take(x, iy, axis=x.ndim - 2)
    x = jnp.take(x, ix, axis=x.ndim - 1)
    return x


def resize_antialias(x, out_hw):
    """skimage.transform.resize parity: bilinear with a Gaussian anti-alias
    prefilter when downscaling (sigma = max(0, (1/zoom - 1) / 2) per axis)."""
    out_h, out_w = out_hw
    in_h, in_w = x.shape[-2], x.shape[-1]
    sig_h = max(0.0, (in_h / out_h - 1.0) / 2.0)
    sig_w = max(0.0, (in_w / out_w - 1.0) / 2.0)
    if sig_h > 1e-8 or sig_w > 1e-8:
        kh = 2 * int(4.0 * max(sig_h, 1e-8) + 0.5) + 1
        kw = 2 * int(4.0 * max(sig_w, 1e-8) + 0.5) + 1
        x = gaussian_blur(x, (kh, kw), (max(sig_h, 1e-8), max(sig_w, 1e-8)))
    return resize_bilinear(x, out_hw, align_corners=False)


def avg_pool2d(x, factor):
    """Non-overlapping average pool of the two trailing axes (torch
    ``F.avg_pool2d(kernel_size=f)`` with truncation of ragged edges)."""
    if factor == 1:
        return x
    h, w = x.shape[-2], x.shape[-1]
    th, tw = (h // factor) * factor, (w // factor) * factor
    x = x[..., :th, :tw]
    new_shape = x.shape[:-2] + (th // factor, factor, tw // factor, factor)
    return x.reshape(new_shape).mean(axis=(-3, -1))


def upsample_flow_bilinear(flow, factor):
    """Bilinear flow upsample with magnitude rescale, GMFlow-style
    (reference unimatch/unimatch.py:84-89): align_corners=True resize then
    multiply the displacement field by the scale factor. ``factor`` may be a
    fraction (e.g. 0.5 to downscale flow to feature resolution as in
    reference methods/dmsct.py:107)."""
    h, w = flow.shape[-3], flow.shape[-2]  # flow is (..., H, W, 2)
    out_h, out_w = int(round(h * factor)), int(round(w * factor))
    moved = jnp.moveaxis(flow, -1, -3)  # (..., 2, H, W)
    moved = resize_bilinear(moved, (out_h, out_w), align_corners=True) * factor
    return jnp.moveaxis(moved, -3, -1)


def pad_to_multiple(x, multiple, mode="edge"):
    """Pad trailing-2 spatial dims up to the next multiple (replicate pad),
    mirroring the reference's encoder padding (reference methods/dmsct.py:76-82,
    where torch 'replicate' == numpy 'edge'). Returns (padded, (H, W))."""
    h, w = x.shape[-3], x.shape[-2]  # assumes (..., H, W, C)
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return x, (h, w)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pad, mode=mode), (h, w)


def _ceil_to(v, m):
    return int(-(-v // m) * m)


def derive_matcher_size(h, w, max_area=500 * 900, padding_factor=32):
    """Static matcher-resolution policy (reference methods/dmsct.py:58-74):
    round (h, w) up to multiples of 32; if the area exceeds ``max_area``, cap
    at the aspect-preserving maximum rounded up to multiples of 32."""
    size = (_ceil_to(h, padding_factor), _ceil_to(w, padding_factor))
    aspect = w / h
    max_h = int((max_area / aspect) ** 0.5)
    max_w = int(max_h * aspect)
    cap = (_ceil_to(max_h, padding_factor), _ceil_to(max_w, padding_factor))
    if size[0] * size[1] > cap[0] * cap[1]:
        return cap
    return size
