"""Fused ResB conv-chain Pallas kernel (DCMCS3DI extraction / transfer).

Reference op: the siamese extractor's 18 ResB blocks (reference
methods/dcmcs3di.py:41-43, pasmnet/backbone.py:4-15) — 36 chained 3x3
convs at (B, 1080, 1920, 64). The round-4 roofline (PERF.md) measured the
XLA path at 16.7 ms/conv f32 — 2.3x the chip's own in-chain conv rate and
~12x bf16 MXU speed-of-light — making extraction 601/517 ms (f32/bf16) of
a 779/682 ms serving step.

TPU-native design (the reference has no kernel here — this is a schedule,
not a translation):

* ROW-MAJOR PLANAR strips (rows, C, W): lanes carry image width (1920 ->
  padded 2048 = 16x128), sublanes carry channels, rows lead untiled.
  Channels-last would waste half of every vector register (C=64 < 128).
* All nine taps of a 3x3 conv collapse into ONE MXU contraction per
  output row: slicing rows r-1..r+1 gives (3, C, W) which flattens to a
  (3C, W) operand for free (row-major layout = stacked sublane tiles),
  and the three per-dx (C, 3C) weight matrices stack on M, so each row is
  one (3C, 3C) @ (3C, W) dot — M=192 (1.5 MXU tiles), K=192, N=2048.
* The dx taps never shift the inputs: the three per-dx accumulators come
  out stacked on sublanes and are lane-rolled AFTER the dot (f32, one
  row) — out[w] = A-1[w-1] + A0[w] + A+1[w+1] — so no rolled copies of
  the strip ever exist in VMEM.
* GROUPED fusion: ``group`` ResB blocks per HBM round trip. A strip of
  ``rows`` output rows is DMA'd in with a 2*group-row halo on each side,
  chained through the whole group in VMEM (x <-> y ping-pong scratch),
  and written back by an explicit DMA. Each conv corrupts one strip-border
  row per side; 2*group convs consume exactly the halo.
* Out-of-image rows and width-pad lanes are re-zeroed after every conv, so
  the fused chain feeds each conv zeros exactly where the unfused XLA
  chain's 'SAME' padding would.

Inference-path kernel: serving + eval only (training keeps the XLA convs,
whose backward XLA already schedules well at crop sizes).
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


def _conv_rows(src_ref, dst_ref, w3, bias, t, valid_cols, *,
               rows_lo, rows_hi, out_rows_base, height, halo, rows, relu,
               residual_ref, compute_dtype):
    """3x3 'SAME' conv over strip rows [rows_lo, rows_hi) of src_ref.

    src_ref/dst_ref: (r_buf, C, Wp) VMEM. w3: (3C, 3C) — the three per-dx
    (C, 3C) weight matrices stacked on M (dx-major), K ordered (dy, cin).
    bias: (C, 1). Rows outside the image (global row = t*rows +
    r - halo outside [0, height)) and pad lanes are stored as zeros.
    If residual_ref is not None the conv output is added to it row-wise
    (dst_ref == residual_ref is the ResB skip connection).
    """
    c = bias.shape[0]
    wp = src_ref.shape[-1]

    def body(r, _):
        win = src_ref[pl.ds(r - 1, 3)].reshape(3 * c, wp)
        # One M=3C dot computes all three per-dx accumulators stacked on
        # sublanes (75% MXU column occupancy vs 50% for three M=C dots;
        # measured equal at the extraction shape — the row loop is
        # VMEM-traffic-bound, not MXU-bound — but it is fewer ops).
        a = jax.lax.dot_general(
            w3, win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # out[w] = A-1[w-1] + A0[w] + A+1[w+1]; the wrapped lanes land in
        # (or come from) the zeroed width pad, so wraparound is harmless.
        acc = pltpu.roll(a[:c], 1, 1) + a[c:2 * c] + pltpu.roll(
            a[2 * c:], wp - 1, 1
        )
        acc += bias
        if relu:
            acc = jnp.where(acc >= 0, acc, 0.01 * acc)
        glob = t * rows + r - halo
        in_image = jnp.logical_and(glob >= 0, glob < height)
        acc = jnp.where(jnp.logical_and(in_image, valid_cols), acc, 0.0)
        val = acc.astype(compute_dtype)
        if residual_ref is not None:
            val = residual_ref[r] + val
        dst_ref[r] = val
        return _

    jax.lax.fori_loop(rows_lo, rows_hi, body, 0)
    _ = out_rows_base  # reserved for future partial-strip variants


def _group_kernel(x_hbm, w_ref, b_ref, out_hbm, x_bufs, y_vmem, sem_in,
                  sem_out, *, rows, halo, group, height, width, n_tiles,
                  total, compute_dtype):
    """One group of ResB blocks over one row strip, double-buffered.

    Grid: (B * n_tiles,) linearized. x_hbm/out_hbm: (B, Hp, C, Wp) in HBM
    with Hp = n_tiles*rows + 2*halo; buffer row i holds global image row
    i - halo (out-of-image rows may be garbage — re-zeroed in VMEM).
    w_ref: (group, 2, 3C, 3C) VMEM; b_ref: (group, 2, C, 1) VMEM.

    DMA schedule (ADVICE r4: the round-4 kernel issued blocking copies, so
    strip N+1's HBM fetch never overlapped strip N's compute): x_bufs holds
    TWO ping-pong input strips. Step ``idx`` computes in slot ``idx % 2``
    while strip ``idx+1`` streams into the other slot, and the write-back
    of slot ``s`` is only waited on when step ``idx+2`` wants to refill
    ``s`` — so both directions of HBM traffic ride under the conv chain.
    """
    idx = pl.program_id(0)
    slot = jax.lax.rem(idx, 2)
    r_buf = rows + 2 * halo
    c = b_ref.shape[2]
    wp = x_bufs.shape[-1]

    def in_copy(i, s):
        bb = jax.lax.div(i, n_tiles)
        tt = jax.lax.rem(i, n_tiles)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(tt * rows, r_buf)], x_bufs.at[s],
            sem_in.at[s],
        )

    def out_copy(i, s):
        bb = jax.lax.div(i, n_tiles)
        tt = jax.lax.rem(i, n_tiles)
        return pltpu.make_async_copy(
            x_bufs.at[s, pl.ds(halo, rows)],
            out_hbm.at[bb, pl.ds(tt * rows + halo, rows)],
            sem_out.at[s],
        )

    @pl.when(idx == 0)
    def _():
        in_copy(idx, slot).start()

    @pl.when(idx + 1 < total)
    def _():
        # Refilling the other slot overwrites the strip whose write-back
        # (started at step idx-1) may still be in flight — drain it first.
        @pl.when(idx >= 1)
        def _():
            out_copy(idx - 1, 1 - slot).wait()

        in_copy(idx + 1, 1 - slot).start()

    in_copy(idx, slot).wait()
    x_vmem = x_bufs.at[slot]

    t = jax.lax.rem(idx, n_tiles)
    # Zero out-of-image rows and pad lanes of the input strip: HBM halo
    # rows are uninitialized between group passes, and every conv below
    # assumes zeros outside the image ('SAME' padding semantics).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r_buf, 1, 1), 0)
    glob = row_ids + (t * rows - halo)
    row_ok = jnp.logical_and(glob >= 0, glob < height)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wp), 2)
    valid_cols = col_ids < width
    x_vmem[...] = jnp.where(
        jnp.logical_and(row_ok, valid_cols), x_vmem[...], 0
    )

    # Strip-border rows of y are never written by the row loop; conv2 reads
    # them, so they must be finite. Zero once (they are halo rows anyway).
    y_vmem[0] = jnp.zeros((c, wp), compute_dtype)
    y_vmem[r_buf - 1] = jnp.zeros((c, wp), compute_dtype)

    conv = functools.partial(
        _conv_rows,
        t=t,
        valid_cols=valid_cols[0],
        rows_lo=1,
        rows_hi=r_buf - 1,
        out_rows_base=0,
        height=height,
        halo=halo,
        rows=rows,
        compute_dtype=compute_dtype,
    )
    for g in range(group):
        conv(x_vmem, y_vmem, w_ref[g, 0], b_ref[g, 0], relu=True,
             residual_ref=None)
        conv(y_vmem, x_vmem, w_ref[g, 1], b_ref[g, 1], relu=False,
             residual_ref=x_vmem)

    out_copy(idx, slot).start()

    @pl.when(idx == total - 1)
    def _():
        if total > 1:
            out_copy(idx - 1, 1 - slot).wait()
        out_copy(idx, slot).wait()


@functools.partial(
    jax.jit,
    static_argnames=("group", "rows", "compute_dtype", "interpret"),
)
def resb_chain(x, kernels, biases, group=3, rows=128,
               compute_dtype=jnp.bfloat16, interpret=False):
    """Chain of ResB blocks (conv3x3 -> LeakyReLU(0.01) -> conv3x3 ->
    +identity) over NHWC input, fused in groups of ``group`` blocks.

    Args:
      x: (B, H, W, C) float input, C a multiple of 8.
      kernels: (L, 2, 3, 3, C, C) flax-layout (kh, kw, cin, cout) kernels —
        the raw ``ResB_i/Conv_j/Conv_0/kernel`` params stacked.
      biases: (L, 2, C).
      group: ResB blocks fused per HBM round trip (L % group == 0).
      rows: output rows per strip — shrunk automatically until the three
        (rows + 2*halo, C, Wp) scratch strips (2 ping-pong input + 1 work)
        fit the VMEM budget (the f32 path needs this; measured OOM at
        rows=128). Budget defaults to 96 MiB of the target v5e/v4 128 MiB
        VMEM; override with CT_CONV_CHAIN_VMEM_MB on other hardware. If
        even the minimum 8-row strip cannot fit, raises a clear ValueError
        instead of a Mosaic compile failure (ADVICE r4).
      compute_dtype: conv operand dtype (params cast, f32 accumulate) —
        matches the flax ``dtype=`` recipe of models/layers.py::Conv.

    Returns (B, H, W, C) float32.
    """
    n_layers = int(kernels.shape[0])
    if n_layers % group:
        raise ValueError(f"layers ({n_layers}) % group ({group}) != 0")
    b, h, w, c = x.shape
    halo = 2 * group
    wp = _round_up(w, LANE)
    rows = min(rows, _round_up(h, 8))
    budget = (
        int(os.environ.get("CT_CONV_CHAIN_VMEM_MB", "96")) * 1024 * 1024
    )
    itemsize_ = np.dtype(compute_dtype).itemsize

    def strips_bytes(r):
        return 3 * (r + 2 * halo) * c * wp * itemsize_

    while rows > 8 and strips_bytes(rows) > budget:
        rows -= 8
    if strips_bytes(rows) > budget:
        raise ValueError(
            f"conv-chain strips do not fit VMEM: minimum strip set "
            f"({strips_bytes(rows) / 2**20:.0f} MiB at rows={rows}, "
            f"C={c}, Wp={wp}, {np.dtype(compute_dtype).name}) exceeds the "
            f"{budget / 2**20:.0f} MiB budget — reduce ``group`` (halo "
            f"shrinks) or set CT_CONV_CHAIN_VMEM_MB for this device"
        )
    n_tiles = -(-h // rows)
    hp = n_tiles * rows + 2 * halo

    # (B, H, W, C) -> row-major planar (B, Hp, C, Wp).
    xp = jnp.transpose(x, (0, 1, 3, 2)).astype(compute_dtype)
    xp = jnp.pad(xp, ((0, 0), (halo, hp - h - halo), (0, 0), (0, wp - w)))

    # (L, 2, kh, kw, cin, cout) -> (L, 2, kw, cout, kh, cin) -> K=(kh, cin).
    wk = jnp.transpose(kernels, (0, 1, 3, 5, 2, 4)).astype(compute_dtype)
    wk = wk.reshape(n_layers, 2, 3 * c, 3 * c)
    bs = biases.astype(jnp.float32)[..., None]  # (L, 2, C, 1)

    kern = functools.partial(
        _group_kernel,
        rows=rows,
        halo=halo,
        group=group,
        height=h,
        width=w,
        n_tiles=n_tiles,
        total=b * n_tiles,
        compute_dtype=compute_dtype,
    )
    itemsize = np.dtype(compute_dtype).itemsize
    n_groups = n_layers // group
    for gi in range(n_groups):
        xp = pl.pallas_call(
            kern,
            grid=(b * n_tiles,),
            out_shape=jax.ShapeDtypeStruct((b, hp, c, wp), compute_dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, rows + 2 * halo, c, wp), compute_dtype),
                pltpu.VMEM((rows + 2 * halo, c, wp), compute_dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * n_tiles * (rows + 2 * halo) * wp * c * c * 9
                * 2 * group,
                bytes_accessed=2 * b * hp * c * wp * itemsize,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xp, wk[gi * group:(gi + 1) * group],
          bs[gi * group:(gi + 1) * group])

    out = xp[:, halo:halo + h, :, :w]
    return jnp.transpose(out, (0, 1, 3, 2)).astype(jnp.float32)
