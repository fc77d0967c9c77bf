"""UniMatch attention/matching variants beyond the GMFlow-flow path.

The reference vendors the full UniMatch module including the stereo-task
branches DMSCT never exercises (SURVEY.md §2.5: 1D cross-attention,
1D swin windows, stereo correlation with the triangular disparity mask —
reference unimatch/attention.py:22-45,:110-166, unimatch/matching.py:129-215).
They are provided here for API completeness; the flow path in
models/gmflow.py does not depend on them.
"""

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.gmflow import _attention
from color_transfer_tpu.core.sampling import coords_grid


def full_attention_1d(q, k, v, h, w):
    """Row-wise W x W attention over flattened (B, H*W, C) tokens
    (reference unimatch/attention.py:22-45)."""
    b, _, c = q.shape
    qr = q.reshape(b * h, w, c)
    kr = k.reshape(b * h, w, c)
    vr = v.reshape(b * h, w, c)
    out = _attention(qr, kr, vr)
    return out.reshape(b, h * w, c)


@lru_cache(maxsize=32)
def _shift_window_mask_1d(w, k):
    """(k, w/k, w/k) additive mask for shifted 1D windows
    (reference unimatch/utils.py:202-219)."""
    ws = w // k
    sw = ws // 2
    img = np.zeros((w,), dtype=np.float32)
    cnt = 0
    for sl in (slice(0, -ws), slice(-ws, -sw), slice(-sw, None)):
        img[sl] = cnt
        cnt += 1
    win = img.reshape(k, ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def swin_attention_1d(q, k, v, num_splits, with_shift, h, w):
    """Shifted-window attention along image width
    (reference unimatch/attention.py:110-166)."""
    b, _, c = q.shape
    ws = w // num_splits

    qr = q.reshape(b * h, w, c)
    kr = k.reshape(b * h, w, c)
    vr = v.reshape(b * h, w, c)

    mask = None
    if with_shift:
        shift = ws // 2
        qr = jnp.roll(qr, -shift, axis=1)
        kr = jnp.roll(kr, -shift, axis=1)
        vr = jnp.roll(vr, -shift, axis=1)
        mask = jnp.tile(jnp.asarray(_shift_window_mask_1d(w, num_splits)), (b * h, 1, 1))

    qw = qr.reshape(b * h * num_splits, ws, c)
    kw = kr.reshape(b * h * num_splits, ws, c)
    vw = vr.reshape(b * h * num_splits, ws, c)
    out = _attention(qw, kw, vw, mask)
    out = out.reshape(b * h, w, c)
    if with_shift:
        out = jnp.roll(out, ws // 2, axis=1)
    return out.reshape(b, h * w, c)


def global_correlation_softmax_stereo(feature0, feature1):
    """Stereo disparity via row-wise global correlation with the triangular
    mask (candidates must lie to the left: reference matching.py:129-167)."""
    b, h, w, c = feature0.shape
    correlation = jnp.einsum("bhwc,bhvc->bhwv", feature0, feature1) / math.sqrt(c)

    x = jnp.arange(w, dtype=jnp.float32)
    # valid[q, c]: candidate must lie at or left of the query column
    # (disparity = x_q - x_c >= 0).
    valid = x[None, :] <= x[:, None]
    correlation = jnp.where(valid[None, None], correlation, -1e9)

    prob = jax.nn.softmax(correlation, axis=-1)
    correspondence = jnp.einsum("bhwv,v->bhw", prob, x)
    disparity = x[None, None, :] - correspondence  # positive disparity
    return disparity, prob


def local_correlation_softmax_stereo(feature0, feature1, local_radius):
    """Windowed stereo correlation along the row (reference matching.py:170-215)."""
    b, h, w, c = feature0.shape
    offsets = jnp.arange(-local_radius, local_radius + 1, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    sample_x = x[:, None] + offsets[None, :]  # (W, K)
    valid = (sample_x >= 0) & (sample_x < w)

    pad = local_radius
    f1p = jnp.pad(feature1, ((0, 0), (0, 0), (pad, pad), (0, 0)))

    def body(_, k):
        shifted = jax.lax.dynamic_slice(
            f1p, (0, 0, k, 0), (b, h, w, c)
        )
        return None, jnp.einsum("bhwc,bhwc->bhw", feature0, shifted)

    _, corr = jax.lax.scan(body, None, jnp.arange(2 * local_radius + 1))
    corr = jnp.moveaxis(corr, 0, -1) / math.sqrt(c)  # (B, H, W, K)
    corr = jnp.where(valid[None, None], corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("bhwk,wk->bhw", prob, sample_x)
    disparity = x[None, None, :] - correspondence
    return disparity, prob
