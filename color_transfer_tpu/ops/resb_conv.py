"""Fused ResB (conv3x3 -> LeakyReLU -> conv3x3 -> +residual) Pallas kernel.

STATUS: experimental — correct (tested vs the XLA reference) but currently
NOT faster: 50 ms vs XLA's 36 ms for 2x1080p ResB on v5e. The 9-shift
formulation runs K=N=64 matmuls at ~25% MXU utilization while XLA's native
f32 conv reaches ~17 TFLOPs/s; the roll+cast overhead eats the bf16 gain.
Next step (TODO.md): im2col with K=9C=576 to double MXU depth utilization.
Not wired into the model; DCMCS3DI uses the XLA conv path.

DCMCS3DI's siamese extractor is 18 ResB blocks at full resolution
(reference methods/dcmcs3di.py:41-43, pasmnet/backbone.py:4-15) — the
dominant cost of full-res inference. This kernel computes both convolutions
as bf16 9-shift MXU matmuls with f32 accumulation, keeps the intermediate
activation in VMEM (no HBM round-trip between the two convs), and fuses the
LeakyReLU and the residual add.

Lowering notes: every tensor the kernel touches keeps a 128-multiple lane
(width) dimension — column shifts are lane rotations (pltpu.roll), row
shifts are static sublane slices. Unaligned-width slicing (the naive
formulation) makes Mosaic's compile time explode super-linearly with W.
Wrap-around columns from the rotation land in the zero padding / get
cropped, and the intermediate is re-zeroed outside the image (matching the
reference's 'same' zero padding of conv1's output before conv2).

Layout: NHWC; RB=8 output rows per grid step with a 2-row halo each side.
Inference-only (training uses the XLA path; crops are small).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8  # output rows per grid step


def _round_up(x, m):
    return -(-x // m) * m


def _resb_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                 negative_slope, true_h, nblk, true_w):
    x = x_ref[0]  # (RB+4, Wp, C) bf16; image col j lives at lane j+2
    c = x.shape[-1]
    wp = x.shape[1]
    rows_t = RB + 2
    i = pl.program_id(0)

    def conv(src_f32, w_ref, rows_out):
        """Σ_dy,dx dot(shift(src)) — 9 accumulated (rows_out*Wp, C) @ (C, C)
        matmuls. Lane-rotated column shifts keep every operand 128-aligned;
        Mosaic only rotates 32-bit lanes, so rolls happen in f32 with a bf16
        cast at the dot. (An im2col K=9C variant was measured SLOWER — the
        VMEM concat relayout costs more than the extra MXU depth buys.)"""
        w_flat = w_ref[...]  # (9C, C), dx-major dy-minor blocks
        acc = jnp.zeros((rows_out * wp, w_flat.shape[-1]), jnp.float32)
        for dx in range(3):
            rolled = pltpu.roll(src_f32, (1 - dx) % wp, 1).astype(jnp.bfloat16)
            for dy in range(3):
                shifted = rolled[dy : dy + rows_out]
                acc = acc + jax.lax.dot(
                    shifted.reshape(rows_out * wp, c),
                    w_flat[(dx * 3 + dy) * c : (dx * 3 + dy + 1) * c],
                    preferred_element_type=jnp.float32,
                )
        return acc

    x_f32 = x.astype(jnp.float32)
    t = conv(x_f32, w1_ref, rows_t) + b1_ref[...]
    t = jnp.where(t >= 0, t, negative_slope * t)

    # Zero the intermediate outside the image (the reference zero-pads
    # conv1's output before conv2; t row j is image row i*RB - 1 + j, t lane
    # j is image col j - 2).
    flat_ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    row_ids = flat_ids // wp
    col_ids = flat_ids % wp
    row_in_image = (i % nblk) * RB - 1 + row_ids
    valid = (
        (row_in_image >= 0)
        & (row_in_image < true_h)
        & (col_ids >= 2)
        & (col_ids < true_w + 2)
    )
    t = jnp.where(valid, t, 0.0)
    t = t.reshape(rows_t, wp, c)  # f32: conv() rolls 32-bit lanes

    out = conv(t, w2_ref, RB) + b2_ref[...]
    res = x_f32[2 : 2 + RB].reshape(RB * wp, c)
    o_ref[0] = (out + res).reshape(RB, wp, c)


@functools.partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def resb_apply(x, w1, b1, w2, b2, negative_slope=0.01, interpret=False):
    """One ResB block: x + conv2(leaky(conv1(x))), 'same' zero padding.

    x: (B, H, W, C) float; w1/w2: (3, 3, C, C); b1/b2: (C,).
    Weights/activations are bf16 operands (f32 MXU accumulation).
    """
    b, h, w, c = x.shape
    hp = _round_up(h, RB)
    wp = _round_up(w + 4, 128)

    xp = jnp.pad(
        x, ((0, 0), (2, 2 + hp - h), (2, wp - w - 2), (0, 0))
    ).astype(jnp.bfloat16)
    nblk = hp // RB
    # Overlapping row windows: block i covers padded rows [i*RB, i*RB+RB+4).
    idx = (jnp.arange(nblk * (RB + 4)) // (RB + 4)) * RB + (
        jnp.arange(nblk * (RB + 4)) % (RB + 4)
    )
    blocks = jnp.take(xp, idx, axis=1).reshape(b * nblk, RB + 4, wp, c)

    out = pl.pallas_call(
        functools.partial(
            _resb_kernel,
            negative_slope=negative_slope,
            true_h=h,
            nblk=nblk,
            true_w=w,
        ),
        grid=(b * nblk,),
        in_specs=[
            pl.BlockSpec((1, RB + 4, wp, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RB, wp, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nblk, RB, wp, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        blocks,
        _flatten_w(w1),
        b1.astype(jnp.float32).reshape(1, -1),
        _flatten_w(w2),
        b2.astype(jnp.float32).reshape(1, -1),
    )
    return out.reshape(b, hp, wp, c)[:, :h, 2 : 2 + w]


def _flatten_w(w):
    """(3, 3, C, Co)[dy, dx] -> (9C, Co) in the kernel's im2col order
    (dx-major, dy-minor)."""
    return (
        jnp.transpose(w, (1, 0, 2, 3))
        .reshape(-1, w.shape[-1])
        .astype(jnp.bfloat16)
    )
