"""Bilinear gather sampling — the JAX/TPU equivalent of torch grid_sample.

The reference warps features/flows with ``F.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=True)`` wrapped by ``bilinear_sample`` /
``flow_warp`` (reference unimatch/geometry.py:44-75). With align_corners=True
the normalize/denormalize round-trip is the identity on pixel coordinates, so
this implementation samples directly in pixel space with a gather and applies
the zeros-padding mask analytically.

Layout is channel-last: images are (..., H, W, C); flows are (..., H, W, 2)
with ``[..., 0] = dx`` (x / width axis) and ``[..., 1] = dy``, matching the
reference's flow channel order (reference unimatch/geometry.py:9-17 stacks
[x, y]).
"""

import jax
import jax.numpy as jnp


def coords_grid(h, w, dtype=jnp.float32):
    """Pixel-coordinate grid of shape (H, W, 2) holding (x, y) per pixel
    (reference unimatch/geometry.py:8-24)."""
    y = jnp.arange(h, dtype=dtype)
    x = jnp.arange(w, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy], axis=-1)


def grid_sample(img, coords, padding_mode="zeros"):
    """Bilinear sample ``img`` at pixel coordinates ``coords``.

    Args:
      img: (H, W, C) array.
      coords: (..., 2) array of (x, y) pixel coordinates.
      padding_mode: 'zeros' (out-of-bounds reads contribute 0) or 'border'.

    Returns:
      (..., C) sampled values. Gradients flow through both img and coords.

    The zeros-padding path fetches each sample's 2x2 neighbourhood with a
    single patch gather (contiguous slices amortize TPU gather's random
    access — ~2x over four corner gathers); far out-of-bounds positions are
    clamped into an all-zeros padding band, which is value-identical.
    """
    h, w = img.shape[0], img.shape[1]
    x = coords[..., 0]
    y = coords[..., 1]

    if padding_mode == "zeros":
        pad = 2
        x = jnp.clip(x, -1.5, w + 0.5)
        y = jnp.clip(y, -1.5, h + 0.5)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None].astype(img.dtype)
        wy = (y - y0)[..., None].astype(img.dtype)

        imgp = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)))
        lead_shape = x.shape
        starts = jnp.stack(
            [y0.astype(jnp.int32) + pad, x0.astype(jnp.int32) + pad], axis=-1
        ).reshape(-1, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        patches = jax.lax.gather(
            imgp, starts, dn, slice_sizes=(2, 2, img.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).reshape(lead_shape + (2, 2, img.shape[-1]))
        top = patches[..., 0, 0, :] * (1 - wx) + patches[..., 0, 1, :] * wx
        bot = patches[..., 1, 0, :] * (1 - wx) + patches[..., 1, 1, :] * wx
        return top * (1 - wy) + bot * wy

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]  # advanced indexing -> gather

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flow_warp(feature, flow, padding_mode="zeros"):
    """Backward-warp ``feature`` by ``flow``: out(p) = feature(p + flow(p)).

    feature: (H, W, C); flow: (H, W, 2). Equivalent to the reference's
    ``flow_warp`` (reference unimatch/geometry.py:68-75). vmap over batch.
    """
    h, w = feature.shape[0], feature.shape[1]
    coords = coords_grid(h, w, flow.dtype) + flow
    return grid_sample(feature, coords, padding_mode=padding_mode)


def forward_backward_consistency(fwd_flow, bwd_flow, alpha=0.01, beta=0.5):
    """Occlusion masks from forward/backward flow disagreement
    (reference unimatch/geometry.py:78-99; UnFlow thresholds).

    fwd_flow, bwd_flow: (H, W, 2). Returns (fwd_occ, bwd_occ) as (H, W)
    float arrays where occluded == 1.
    """
    flow_mag = jnp.linalg.norm(fwd_flow, axis=-1) + jnp.linalg.norm(bwd_flow, axis=-1)
    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)
    diff_fwd = jnp.linalg.norm(fwd_flow + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd_flow + warped_fwd, axis=-1)
    threshold = alpha * flow_mag + beta
    return (
        (diff_fwd > threshold).astype(fwd_flow.dtype),
        (diff_bwd > threshold).astype(fwd_flow.dtype),
    )
