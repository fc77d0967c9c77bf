"""UniMatch attention/matching variants beyond the GMFlow-flow path.

The reference vendors the full UniMatch module including the stereo- and
depth-task branches DMSCT never exercises (SURVEY.md §2.5: 1D
cross-attention, 1D swin windows, stereo correlation with the triangular
disparity mask, plane-sweep depth correlation and the depth/pose geometry
helpers — reference unimatch/attention.py:22-45,:110-166,
unimatch/matching.py:129-282, unimatch/geometry.py:102-198). They are
provided here for API completeness; the flow path in models/gmflow.py does
not depend on them. Layout is channel-last throughout: features are
(B, H, W, C), 3D points (B, H, W, 3), pixel coords (..., 2) as (x, y).
"""

import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.gmflow import _attention
from color_transfer_tpu.core.sampling import coords_grid, grid_sample


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


# ---------------------------------------------------------------------------
# Depth/pose geometry (reference unimatch/geometry.py:102-198)
# ---------------------------------------------------------------------------


def _homogeneous_grid(h, w, dtype=jnp.float32):
    """(H, W, 3) pixel grid (x, y, 1) — reference coords_grid(homogeneous=True)."""
    grid = coords_grid(h, w, dtype)
    return jnp.concatenate([grid, jnp.ones((h, w, 1), dtype)], axis=-1)


def back_project(depth, intrinsics):
    """Lift pixels to 3D camera-frame points (reference geometry.py:102-113).

    depth: (B, H, W); intrinsics: (B, 3, 3). Returns (B, H, W, 3)."""
    b, h, w = depth.shape
    homo = _homogeneous_grid(h, w, depth.dtype)
    rays = jnp.einsum("bij,hwj->bhwi", jnp.linalg.inv(intrinsics), homo)
    return rays * depth[..., None]


def camera_transform(points_ref, extrinsics_ref=None, extrinsics_tgt=None,
                     extrinsics_rel=None):
    """Rigid transform of 3D points into the target camera frame
    (reference geometry.py:116-132). points_ref: (B, H, W, 3)."""
    if extrinsics_rel is None:
        extrinsics_rel = jnp.einsum(
            "bij,bjk->bik", extrinsics_tgt, jnp.linalg.inv(extrinsics_ref)
        )
    rotated = jnp.einsum("bij,bhwj->bhwi", extrinsics_rel[:, :3, :3], points_ref)
    return rotated + extrinsics_rel[:, None, None, :3, 3]


def reproject(points_tgt, intrinsics, return_mask=False):
    """Pinhole projection back to pixel coordinates
    (reference geometry.py:135-157). Returns (B, H, W, 2) [, (B, H, W) mask]."""
    b, h, w, _ = points_tgt.shape
    proj = jnp.einsum("bij,bhwj->bhwi", intrinsics, points_tgt)
    z = jnp.clip(proj[..., 2:], 1e-3, None)
    coords = proj[..., :2] / z
    if return_mask:
        mask = (
            (coords[..., 0] >= 0)
            & (coords[..., 0] <= w - 1)
            & (coords[..., 1] >= 0)
            & (coords[..., 1] <= h - 1)
        )
        return coords, mask
    return coords


def reproject_coords(depth_ref, intrinsics, extrinsics_ref=None,
                     extrinsics_tgt=None, extrinsics_rel=None,
                     return_mask=False):
    """Reprojection sample coords for a depth map (reference geometry.py:160-175)."""
    points_tgt = camera_transform(
        back_project(depth_ref, intrinsics),
        extrinsics_ref, extrinsics_tgt, extrinsics_rel=extrinsics_rel,
    )
    return reproject(points_tgt, intrinsics, return_mask=return_mask)


def compute_flow_with_depth_pose(depth_ref, intrinsics, extrinsics_ref=None,
                                 extrinsics_tgt=None, extrinsics_rel=None,
                                 return_mask=False):
    """Rigid flow induced by depth + relative pose (reference geometry.py:178-198)."""
    b, h, w = depth_ref.shape
    init = coords_grid(h, w, depth_ref.dtype)[None]
    if return_mask:
        coords, mask = reproject_coords(
            depth_ref, intrinsics, extrinsics_ref, extrinsics_tgt,
            extrinsics_rel=extrinsics_rel, return_mask=True,
        )
        return coords - init, mask
    coords = reproject_coords(
        depth_ref, intrinsics, extrinsics_ref, extrinsics_tgt,
        extrinsics_rel=extrinsics_rel,
    )
    return coords - init


# ---------------------------------------------------------------------------
# Plane-sweep depth matching (reference unimatch/matching.py:206-282)
# ---------------------------------------------------------------------------


def warp_with_pose_depth_candidates(feature1, intrinsics, pose, depth,
                                    clamp_min_depth=1e-3):
    """Warp feature1 through every depth-candidate plane
    (reference matching.py:242-282).

    feature1: (B, H, W, C); intrinsics: (B, 3, 3); pose: (B, 4, 4);
    depth: (B, D, H, W) actual depths. Returns (B, D, H, W, C).

    The reference normalizes coords to [-1, 1] for grid_sample with
    align_corners=True — an identity round-trip in pixel space, so this
    samples pixel coordinates directly (core/sampling.py)."""
    b, d, h, w = depth.shape
    homo = _homogeneous_grid(h, w, feature1.dtype)
    rays = jnp.einsum("bij,hwj->bhwi", jnp.linalg.inv(intrinsics), homo)
    rays = jnp.einsum("bij,bhwj->bhwi", pose[:, :3, :3], rays)
    points = rays[:, None] * depth[..., None] + pose[:, None, None, None, :3, 3]
    proj = jnp.einsum("bij,bdhwj->bdhwi", intrinsics, points)
    z = jnp.clip(proj[..., 2:], clamp_min_depth, None)
    coords = proj[..., :2] / z  # (B, D, H, W, 2)
    sample = jax.vmap(grid_sample)(feature1, coords.reshape(b, d * h, w, 2))
    return sample.reshape(b, d, h, w, -1)


def correlation_softmax_depth(feature0, feature1, intrinsics, pose,
                              depth_candidates, depth_from_argmax=False,
                              pred_bidir_depth=False):
    """Plane-sweep correlation softmax over inverse-depth candidates
    (reference matching.py:206-239).

    feature0/feature1: (B, H, W, C); depth_candidates: (B, D, H, W) holds
    INVERSE depths (the reference divides before warping). Returns
    (depth (B, 1, H, W), match_prob (B, D, H, W))."""
    b, h, w, c = feature0.shape
    if pred_bidir_depth:
        feature0, feature1 = (
            jnp.concatenate([feature0, feature1], axis=0),
            jnp.concatenate([feature1, feature0], axis=0),
        )
        intrinsics = jnp.tile(intrinsics, (2, 1, 1))
        pose = jnp.concatenate([pose, jnp.linalg.inv(pose)], axis=0)
        depth_candidates = jnp.tile(depth_candidates, (2, 1, 1, 1))

    warped = warp_with_pose_depth_candidates(
        feature1, intrinsics, pose, 1.0 / depth_candidates
    )  # (B, D, H, W, C)
    correlation = jnp.einsum(
        "bhwc,bdhwc->bdhw", feature0, warped
    ) / math.sqrt(c)
    match_prob = jax.nn.softmax(correlation, axis=1)

    if depth_from_argmax:
        index = jnp.argmax(match_prob, axis=1, keepdims=True)
        depth = jnp.take_along_axis(depth_candidates, index, axis=1)
    else:
        depth = jnp.sum(match_prob * depth_candidates, axis=1, keepdims=True)
    return depth, match_prob
