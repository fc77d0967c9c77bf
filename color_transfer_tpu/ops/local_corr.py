"""Pallas kernel for flow-displaced local correlation (the GRU-loop wall).

Reference op: unimatch/matching.py:89-126 ``local_correlation_with_flow`` —
for every pixel p, correlate feature0[p] against a (2r+1)^2 window of
feature1 sampled bilinearly at ``p + flow[p] + offset``.

Why a kernel: the XLA formulation is a gather of (1, k, C) rows per pixel
per window row. On TPU that cost is bound by the number of contiguous
memory runs the gather issues (B*HW*k runs at ~45 ns each — measured, see
PERF.md), NOT by bytes: ~93 ms/iteration at DMSCT's training shape, 77% of
the frozen matcher's step time across the 6 GRU iterations.

Schedule: the whole zero-padded feature1 image is DMA'd into VMEM once per
batch index (its BlockSpec index map is constant across the pixel-block
grid axis, so Pallas re-uses the resident copy), and each pixel's
(k, k, C) patch is then read straight out of VMEM at vector-load speed —
no HBM gather descriptors at all. The bilinear fractional interpolation is
applied OUTSIDE the kernel on the (k, k) correlation grid (all window taps
share one bilinear phase because the offsets are integers), identical to
the XLA path, so the kernel stays a pure integer-window dot.

Exactness: arbitrary flows are handled by the same clamp-into-the-padding
-band trick as the XLA path — positions further than (r+2) outside the
image read zeros either way, so clamping them into the zero band is
value-identical to torch grid_sample's zeros padding.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_epilogue(dots, wx, wy, r, c):
    """Shared tail: 4-corner interpolation on the (k, k) integer-dot grid
    (all window taps share one bilinear phase) then crop to (2r+1)^2."""
    d00 = dots[:, :, :-1, :-1]
    d01 = dots[:, :, :-1, 1:]
    d10 = dots[:, :, 1:, :-1]
    d11 = dots[:, :, 1:, 1:]
    interp = (
        d00 * (1 - wy) * (1 - wx)
        + d01 * (1 - wy) * wx
        + d10 * wy * (1 - wx)
        + d11 * wy * wx
    )
    corr = interp[:, :, : 2 * r + 1, : 2 * r + 1]
    b, n = dots.shape[:2]
    return corr.reshape(b, -1, (2 * r + 1) ** 2) / math.sqrt(c)


def _select_columns(dots_wide, roff, k):
    """Pick each pixel's k true window columns out of the 8-aligned superset
    via a vectorized masked sum over the 8 possible sub-offsets (elementwise
    — no gather; XLA fuses the 8 shifted reads into one pass)."""
    b, n = dots_wide.shape[:2]
    mask = roff[:, :, None, None]
    dots = jnp.zeros((b, n, k, k), jnp.float32)
    for off in range(8):
        piece = jax.lax.slice_in_dim(dots_wide, off, off + k, axis=3)
        dots = dots + jnp.where(mask == off, piece, 0.0)
    return dots


def _extract_kernel(starts_ref, f0_ref, f1_ref, out_ref, *, k, wp, p_blk):
    """One (batch, pixel-block) grid step.

    starts_ref: (1, 1, 8, p_blk//8) int32 in SMEM — packed ry * wp + rx
      patch starts into the padded feature1 image (scalar reads must come
      from SMEM; the 4D shape keeps the trailing block dims equal to the
      array dims, which Mosaic's block-mapping rules require).
    f0_ref: (1, p_blk, C) VMEM — feature0 pixels for this block.
    f1_ref: (1, Hp, Wp, C) VMEM — the full padded feature1 image; constant
      index map across the block axis keeps it resident.
    out_ref: (1, p_blk, k, k+8) f32 — raw window dots over the 8-aligned
      superset window (no bilinear, no scale).

    The per-pixel dynamic window read stays off the lane axis: the window-row
    offset ry indexes the leading (untiled) axis of f1_ref — freely dynamic —
    and the channel axis is a full lane slice. The window-column offset rx
    lands on the SUBLANE axis, where Mosaic requires dynamic indices to be
    provably 8-aligned: the load therefore takes the 8-aligned (k, k+8, C)
    superset window at rx8 = 8*(rx//8) and the kernel emits ALL k+8 column
    dots; the caller selects the k true columns with a vectorized masked sum
    on roff = rx - rx8 (doing the select in-kernel as predicated stores
    compiles minutes-slow in Mosaic — 64 cases after the group unroll).
    """
    cols = p_blk // 8

    def group(g, carry):
        # f0 reads are also sublane-indexed, so fetch an aligned group of 8
        # pixels once and pick each row with a static slice.
        base = pl.multiple_of(g * 8, 8)
        f0g = f0_ref[0, pl.ds(base, 8), :].astype(jnp.float32)  # (8, C)
        for j in range(8):
            flat = g * 8 + j
            s = starts_ref[0, 0, flat // cols, flat % cols]
            ry = s // wp
            rx8 = pl.multiple_of(((s - ry * wp) // 8) * 8, 8)
            patch = f1_ref[0, pl.ds(ry, k), pl.ds(rx8, k + 8), :]
            f0p = jax.lax.slice(f0g, (j, 0), (j + 1, f0g.shape[1]))  # (1, C)
            prod = patch.astype(jnp.float32) * f0p[None]
            out_ref[0, pl.ds(base + j, 1)] = jnp.sum(prod, axis=-1)[None]
        return carry

    jax.lax.fori_loop(0, p_blk // 8, group, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "local_radius", "corr_dtype", "p_blk", "interpret", "variant"
    ),
)
def local_correlation_with_flow_pallas(
    feature0,
    feature1,
    flow,
    local_radius,
    corr_dtype=jnp.bfloat16,
    p_blk=256,
    interpret=False,
    variant="vpu",
):
    """Drop-in replacement for the XLA ``local_correlation_with_flow``
    (models/gmflow.py) — same inputs, same (B, H, W, (2r+1)^2) output, same
    zeros-padding/bilinear semantics, f32 accumulation.

    variant: "vpu" reduces the channel dot on the VPU (lane-axis reduction;
    exact f32 products for any corr_dtype); "mxu" contracts on the MXU via
    per-8-pixel-group matmuls (see ``_mxu_kernel``) — ~2.5x faster at
    DMSCT's shapes because the VPU path is bound by the cross-lane
    reduction, and bit-comparable for bf16 inputs (bf16 x bf16 products are
    exact in f32 accumulation on the MXU).
    """
    if variant == "mxu":
        return _local_corr_mxu(
            feature0, feature1, flow, local_radius, corr_dtype, p_blk,
            interpret,
        )
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 3  # window plus one bilinear corner each side
    pad = 2 * r + 4
    # +8 columns on the right so the kernel's 8-aligned (k+8)-wide superset
    # window never reads past the buffer (see _extract_kernel).
    hp, wp = h + 2 * pad, w + 2 * pad + 8

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
        indexing="ij",
    )
    bx = jnp.clip(xs[None] + flow[..., 0], -(r + 2.0), w + r + 1.0)
    by = jnp.clip(ys[None] + flow[..., 1], -(r + 2.0), h + r + 1.0)
    x0 = jnp.floor(bx)
    y0 = jnp.floor(by)
    wx = (bx - x0).reshape(b, h * w, 1, 1)
    wy = (by - y0).reshape(b, h * w, 1, 1)
    rx = (x0.astype(jnp.int32) - r + pad).reshape(b, h * w)
    roff = rx % 8  # sub-window offset within the kernel's 8-aligned load
    starts = (y0.astype(jnp.int32) - r + pad).reshape(b, h * w) * wp + rx

    f1p = jnp.pad(
        feature1.astype(corr_dtype),
        ((0, 0), (pad, pad), (pad, pad + 8), (0, 0)),
    )
    f0 = feature0.astype(corr_dtype).reshape(b, h * w, c)

    n = h * w
    n_pad = -(-n // p_blk) * p_blk
    if n_pad != n:
        # Padding pixels read the zero band at start 0 — harmless garbage
        # dots, cropped below.
        starts = jnp.pad(starts, ((0, 0), (0, n_pad - n)))
        f0 = jnp.pad(f0, ((0, 0), (0, n_pad - n), (0, 0)))
    blocks = n_pad // p_blk
    starts = starts.reshape(b, blocks, 8, p_blk // 8)

    dots_wide = pl.pallas_call(
        functools.partial(_extract_kernel, k=k, wp=wp, p_blk=p_blk),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, k, k + 8), jnp.float32),
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, p_blk // 8), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, p_blk, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hp, wp, c), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, p_blk, k, k + 8), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        # The resident f1 image (double-buffered by the pipeline) dominates
        # VMEM; at the 512x896 matcher cap's 1/4 scale it is ~18 MB in f32.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, f0, f1p)

    dots = _select_columns(dots_wide[:, :n], roff, k)
    return _bilinear_epilogue(dots, wx, wy, r, c).reshape(
        b, h, w, (2 * r + 1) ** 2
    )


def _mxu_group_kernel(
    starts_ref, f0t_ref, f1_ref, out_ref, scratch, *, k, wp, w_sup,
    g_per_blk, precision
):
    """One (batch, pixel-block) grid step of the MXU variant.

    Per group of 8 pixels: copy each pixel's 8-aligned (k, w_sup, C) window
    out of the VMEM-resident padded feature1 into a (k, 8*w_sup, C) scratch
    (one 3D load + one 3D store per pixel — sublane starts j*w_sup are
    8-aligned because w_sup is), then contract channels on the MXU with k
    dots ``scratch[i] (8*w_sup, C) @ f0_group (C, 8)``. Column j of the
    result is only meaningful for pixel j's rows — the 8x junk columns are
    filtered by a fused masked-sum outside the kernel. Rationale: the VPU
    variant is bound by the cross-lane channel reduction (~306 cycles/pixel
    measured); the MXU sums lanes natively, and the all-pairs waste rides
    the otherwise-idle N axis of the systolic array.

    f0t_ref: (1, g_per_blk, 8, C) — feature0 pre-grouped; the dot contracts
    both operands' lane (channel) axes so the kernel never slices or
    transposes the lane axis.
    out_ref: (1, g_per_blk, k, 8, 8*w_sup) f32 raw group dots — the 8-pixel
    axis rides the sublanes and the slab axis the lanes, so the HBM tiled
    layout pads 8*w_sup up to the next 128 multiple (1.33x) instead of
    padding an 8-wide lane axis to 128 (16x, which OOMs HBM).
    """
    cols = g_per_blk  # starts are packed (8, p_blk // 8) with p_blk = 8*cols

    def group(g, carry):
        for j in range(8):
            flat = g * 8 + j
            s = starts_ref[0, 0, flat // cols, flat % cols]
            ry = s // wp
            rx8 = pl.multiple_of(((s - ry * wp) // 8) * 8, 8)
            scratch[:, pl.ds(j * w_sup, w_sup), :] = f1_ref[
                0, pl.ds(ry, k), pl.ds(rx8, w_sup), :
            ]
        f0g = f0t_ref[0, g]  # (8, C)
        for i in range(k):
            out_ref[0, g, i] = jax.lax.dot_general(
                f0g,
                scratch[i],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
        return carry

    jax.lax.fori_loop(0, g_per_blk, group, 0)


def _local_corr_mxu(
    feature0, feature1, flow, local_radius, corr_dtype, p_blk, interpret
):
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 3  # window plus one bilinear corner each side
    pad = 2 * r + 4
    w_sup = -(-(k + 8) // 8) * 8  # 8-aligned superset window width
    # Right padding so rx8 + w_sup never reads past the row (max rx is
    # w + 1 + pad, see the clip below).
    extra = -(-max(1 + w_sup - pad, 1) // 8) * 8
    hp, wp = h + 2 * pad, w + 2 * pad + extra

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
        indexing="ij",
    )
    bx = jnp.clip(xs[None] + flow[..., 0], -(r + 2.0), w + r + 1.0)
    by = jnp.clip(ys[None] + flow[..., 1], -(r + 2.0), h + r + 1.0)
    x0 = jnp.floor(bx)
    y0 = jnp.floor(by)
    wx = (bx - x0).reshape(b, h * w, 1, 1)
    wy = (by - y0).reshape(b, h * w, 1, 1)
    rx = (x0.astype(jnp.int32) - r + pad).reshape(b, h * w)
    roff = rx % 8
    starts = (y0.astype(jnp.int32) - r + pad).reshape(b, h * w) * wp + rx

    f1p = jnp.pad(
        feature1.astype(corr_dtype),
        ((0, 0), (pad, pad), (pad, pad + extra), (0, 0)),
    )
    f0 = feature0.astype(corr_dtype).reshape(b, h * w, c)

    n = h * w
    n_pad = -(-n // p_blk) * p_blk
    if n_pad != n:
        starts = jnp.pad(starts, ((0, 0), (0, n_pad - n)))
        f0 = jnp.pad(f0, ((0, 0), (0, n_pad - n), (0, 0)))
    blocks = n_pad // p_blk
    g_per_blk = p_blk // 8
    n_groups = n_pad // 8
    starts = starts.reshape(b, blocks, 8, g_per_blk)
    # (B, n_groups, 8, C): the group's 8 feature0 vectors as dot LHS rows.
    f0t = f0.reshape(b, n_groups, 8, c)

    raw = pl.pallas_call(
        functools.partial(
            _mxu_group_kernel, k=k, wp=wp, w_sup=w_sup, g_per_blk=g_per_blk,
            # This backend defaults f32 matmuls to one-pass bf16; HIGHEST
            # keeps f32 operands exact (multi-pass). bf16 operands are
            # already exact one-pass (bf16 x bf16 -> f32 products), and
            # Mosaic rejects fp32 contract precision on bf16 inputs.
            precision=(
                jax.lax.Precision.HIGHEST
                if jnp.dtype(corr_dtype) == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_groups, k, 8, 8 * w_sup), jnp.float32
        ),
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, g_per_blk), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, g_per_blk, 8, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hp, wp, c), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, g_per_blk, k, 8, 8 * w_sup), lambda i, j: (i, j, 0, 0, 0),
        ),
        scratch_shapes=[pltpu.VMEM((k, 8 * w_sup, c), jnp.dtype(corr_dtype))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, f0t, f1p)

    # Keep pixel j's own slab of each group dot (fused masked sum over the
    # dot-row axis — the 8x junk rows are read once and dropped) and
    # re-flatten groups to pixels.
    raw = raw.reshape(b, n_groups, k, 8, 8, w_sup)  # (.., j2, slab j, x)
    eye = (
        jnp.arange(8)[:, None] == jnp.arange(8)[None, :]
    ).astype(jnp.float32)
    own = jnp.sum(raw * eye[None, None, None, :, :, None], axis=3)
    dots_wide = (
        jnp.transpose(own, (0, 1, 3, 2, 4))  # (B, nG, 8, k, w_sup)
        .reshape(b, n_pad, k, w_sup)[:, :n]
    )
    dots = _select_columns(dots_wide, roff, k)
    return _bilinear_epilogue(dots, wx, wy, r, c).reshape(
        b, h, w, (2 * r + 1) ** 2
    )
