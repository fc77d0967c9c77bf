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
from jax.experimental import pallas as pl


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


def _warp_geometry(flow, h, w):
    """Shared forward/adjoint geometry of the zeros-padding warp: clamped
    sample positions, integer corner starts into the 2-pixel padded image,
    and the bilinear fractions. flow: (B, H, W, 2)."""
    coords = coords_grid(h, w, flow.dtype)[None] + flow
    x = jnp.clip(coords[..., 0], -1.5, w + 0.5)
    y = jnp.clip(coords[..., 1], -1.5, h + 0.5)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    starts = jnp.stack(
        [y0.astype(jnp.int32) + 2, x0.astype(jnp.int32) + 2], axis=-1
    )
    return x, y, starts, wx, wy


def _warp_fwd_batched(feature, flow):
    """(B, H, W, C) x (B, H, W, 2) zeros-padding bilinear backward-warp via
    one (2, 2, C)-patch gather per pixel (see ``grid_sample``)."""
    b, h, w, c = feature.shape
    _, _, starts, wx, wy = _warp_geometry(flow, h, w)
    fp = jnp.pad(feature, ((0, 0), (2, 2), (2, 2), (0, 0)))
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None], (b, h, w, 1)
    )
    idx = jnp.concatenate([bidx, starts], axis=-1).reshape(-1, 3)
    patches = jax.lax.gather(
        fp, idx, dn, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(b, h, w, 2, 2, c)
    wxe = wx[..., None]
    wye = wy[..., None]
    top = patches[..., 0, 0, :] * (1 - wxe) + patches[..., 0, 1, :] * wxe
    bot = patches[..., 1, 0, :] * (1 - wxe) + patches[..., 1, 1, :] * wxe
    return top * (1 - wye) + bot * wye, patches


def _bilinear_scatter_kernel(c, packed_ref, g4_ref, out_ref, acc_ref, row_ref, sem):
    """Serial adjoint-warp scatter for ONE image (grid step = batch index).

    packed: (1, H, W) int32 = y0 * (W+4) + x0, the corner start into the
    padded grad image; g4: (1, H, W, 4C) cotangent pre-multiplied by the
    four corner weights (w00*g | w01*g | w10*g | w11*g — folded outside the
    kernel so no per-sample scalar float reads are needed); out:
    (1, H+4, W+4, C); acc: (H+4, W+4, C) VMEM scratch; row: (1, W) SMEM
    scratch; sem: DMA semaphore.

    TPU constraints shaping this kernel: dynamic addresses for stores must
    be scalars, and scalar reads are only legal from SMEM (lane-dynamic
    VMEM reads don't compile) — so each row of packed corner starts is
    DMA'd VMEM->SMEM and read per-sample from there. Dynamic
    read-modify-writes go through the VMEM scratch accumulator (windowed
    output refs can't take them without losing block windowing).

    Why it exists: XLA lowers the warp gather's transpose (scatter-add of
    2x2xC windows at data-dependent positions) to a serialized full-array
    update loop — measured 1.8 s for (12, 128, 240, 16) on v5e. This kernel
    performs the same serial read-modify-write at VMEM latency instead.
    """
    import jax.lax as lax
    from jax.experimental.pallas import tpu as pltpu

    h, w = g4_ref.shape[1], g4_ref.shape[2]  # packed_ref is width-padded
    w4 = out_ref.shape[2]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    # DMA 8 rows of corner starts at a time (sublane slices must be
    # 8-aligned), then walk the 8*W samples serially.
    def rows_body(i8, carry):
        base = pl.multiple_of(i8 * 8, 8)
        cp = pltpu.make_async_copy(
            packed_ref.at[0, pl.ds(base, 8), :], row_ref, sem
        )
        cp.start()
        cp.wait()

        def body(s, c2):
            di = s // w
            j = s - di * w
            i = base + di
            packed = row_ref[di, j]
            y0 = packed // w4
            x0 = packed - y0 * w4
            g4 = g4_ref[0, pl.ds(i, 1), pl.ds(j, 1), :][0]  # (1, 4C)
            acc_ref[pl.ds(y0, 1), pl.ds(x0, 1), :] += g4[:, 0:c]
            acc_ref[pl.ds(y0, 1), pl.ds(x0 + 1, 1), :] += g4[:, c : 2 * c]
            acc_ref[pl.ds(y0 + 1, 1), pl.ds(x0, 1), :] += g4[:, 2 * c : 3 * c]
            acc_ref[pl.ds(y0 + 1, 1), pl.ds(x0 + 1, 1), :] += g4[:, 3 * c :]
            return c2

        lax.fori_loop(0, 8 * w, body, 0)
        return carry

    lax.fori_loop(0, h // 8, rows_body, 0)
    out_ref[0] = acc_ref[...]


def _adjoint_warp_pallas(starts, wx, wy, g, interpret=False):
    """Pallas scatter: returns the PADDED feature cotangent (B, H+4, W+4, C).

    starts: (B, H, W, 2) int32 (y0, x0); wx/wy: (B, H, W) fractions."""
    import functools

    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = g.shape
    packed = starts[..., 0] * (w + 4) + starts[..., 1]
    # DMA slices need 128-aligned lane extents: pad the packed-starts width
    # (padding lanes are copied but never read — the sample loop stops at w).
    wp = -(-w // 128) * 128
    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, wp - w)))
    wxe = wx[..., None].astype(g.dtype)
    wye = wy[..., None].astype(g.dtype)
    g4 = jnp.concatenate(
        [
            (1 - wxe) * (1 - wye) * g,
            wxe * (1 - wye) * g,
            (1 - wxe) * wye * g,
            wxe * wye * g,
        ],
        axis=-1,
    )
    return pl.pallas_call(
        functools.partial(_bilinear_scatter_kernel, c),
        out_shape=jax.ShapeDtypeStruct((b, h + 4, w + 4, c), g.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w, 4 * c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h + 4, w + 4, c), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h + 4, w + 4, c), g.dtype),
            pltpu.SMEM((8, wp), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Lane padding (C < 128) inflates the windows well past the 16 MB
        # default scoped-vmem cap; the real budget on v5e is 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed, g4)


def _adjoint_warp_xla(starts, corner_w, g):
    """Reference adjoint via XLA scatter-add (CPU fallback / oracle)."""
    b, h, w, c = g.shape
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None], (b, h, w, 1)
    )
    idx = jnp.concatenate([bidx, starts], axis=-1).reshape(-1, 3)
    upd = (corner_w.reshape(b, h, w, 2, 2)[..., None] * g[:, :, :, None, None, :])
    acc = jnp.zeros((b, h + 4, w + 4, c), g.dtype)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    return jax.lax.scatter_add(
        acc, idx, upd.reshape(-1, 2, 2, c), dn,
        mode=jax.lax.GatherScatterMode.CLIP,
    )


@jax.custom_vjp
def flow_warp_batched(feature, flow):
    """Batched backward-warp with a TPU-fast adjoint.

    Forward-identical to ``jax.vmap(flow_warp)`` (zeros padding). The
    custom VJP replaces the feature cotangent's serialized XLA scatter-add
    with a Pallas VMEM-resident scatter on TPU (the XLA scatter costs ~2.4 s
    of DMSCT's train step at the reference recipe shape,
    reference configs/dmsct.yaml:13-18).
    """
    out, _ = _warp_fwd_batched(feature, flow)
    return out


def _flow_warp_batched_fwd(feature, flow):
    out, _ = _warp_fwd_batched(feature, flow)
    return out, (feature, flow)


def _flow_warp_batched_bwd(res, g):
    feature, flow = res
    b, h, w, c = feature.shape
    x, y, starts, wx, wy = _warp_geometry(flow, h, w)

    # The kernel needs its lane-padded windows resident in VMEM: the
    # accumulator + g4 window + output window, each with C padded to 128
    # lanes and the output/g4 double-buffered. Route shapes that would blow
    # the 110 MB budget (see CompilerParams below) to the XLA fallback
    # instead of failing at compile time.
    c_pad = -(-c // 128) * 128
    g4_pad = -(-4 * c // 128) * 128
    kernel_vmem = (
        (h + 4) * (w + 4) * c_pad * 4 * 3  # acc scratch + out window x2 buf
        + h * w * g4_pad * 4 * 2  # g4 window x2 buf
    )
    fits = kernel_vmem < 100 * 1024 * 1024
    if jax.default_backend() == "tpu" and h % 8 == 0 and fits:
        dpad = _adjoint_warp_pallas(starts, wx, wy, g)
    else:
        corner_w = jnp.stack(
            [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy],
            axis=-1,
        ).astype(g.dtype)
        dpad = _adjoint_warp_xla(starts, corner_w, g)
    dfeature = dpad[:, 2 : 2 + h, 2 : 2 + w, :]

    # Flow cotangent: re-gather the forward patches (cheap) and apply the
    # analytic bilinear derivative; zero where the sample position was
    # clamped (matches the piecewise-constant clamp). DCE removes this whole
    # branch when the flow cotangent is unused (e.g. DMSCT's frozen matcher).
    _, patches = _warp_fwd_batched(feature, flow)
    wxe = wx[..., None]
    wye = wy[..., None]
    ddx = (patches[..., 0, 1, :] - patches[..., 0, 0, :]) * (1 - wye) + (
        patches[..., 1, 1, :] - patches[..., 1, 0, :]
    ) * wye
    ddy = (patches[..., 1, 0, :] - patches[..., 0, 0, :]) * (1 - wxe) + (
        patches[..., 1, 1, :] - patches[..., 0, 1, :]
    ) * wxe
    gx = jnp.sum(g * ddx, axis=-1)
    gy = jnp.sum(g * ddy, axis=-1)
    gx = jnp.where((x > -1.5) & (x < w + 0.5), gx, 0.0)
    gy = jnp.where((y > -1.5) & (y < h + 0.5), gy, 0.0)
    dflow = jnp.stack([gx, gy], axis=-1).astype(flow.dtype)
    return dfeature.astype(feature.dtype), dflow


flow_warp_batched.defvjp(_flow_warp_batched_fwd, _flow_warp_batched_bwd)


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
