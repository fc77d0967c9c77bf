"""Fused row-wise parallax attention (Pallas TPU kernel).

The DCMCS3DI matcher's hot loop is row-wise cross-view attention over image
width: softmax(Q K^T / C) applied to values, per (batch, row) — a (W, W)
score matrix per row (reference pasmnet/attention.py:39-46, pasmnet/utils.py
masked softmax + warp). Materializing the (B, H, W, W) attention at 1080p is
~16 GB — the reason the reference downscales inputs 0.75x at inference
(reference demo.ipynb cell 24). This kernel never materializes it: each grid
step holds a (RB, TQ, W) score tile in VMEM for RB=8 image rows, softmaxes
it, applies it to V and accumulates the attention column sums that the
valid-mask needs (reference pasmnet/utils.py:34: mask = colsum(att) > 0.1).

Peak memory drops from O(B*H*W^2) to O(B*H*W*C), so full-res 1080p inference
fits a single chip's HBM. Inference-only (training consumes the materialized
maps for the cycle loss; reference pasmnet/losses.py:24-46).

Layout: inputs (B, H, W, C) channel-last; grid (B*H/RB, W/TQ); each step
batches RB rows through the MXU with one dot_general.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8  # (batch*row) group per grid step — matches the f32 sublane tile


def _round_up(x, m):
    return -(-x // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, cs_ref, *, scale, w_true, tq):
    qi = pl.program_id(1)

    q = q_ref[...]  # (RB, TQ, C) bf16
    k = k_ref[...]  # (RB, Wp, C) bf16
    v = v_ref[...]  # (RB, Wp, Cv) bf16

    # bf16 x bf16 -> f32 accumulation: native MXU mode. Softmax stays f32.
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (RB, TQ, Wp)

    wp = scores.shape[-1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (RB, tq, wp), 2)
    scores = jnp.where(col_ids < w_true, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    att = p / jnp.sum(p, axis=-1, keepdims=True)  # (RB, TQ, Wp)

    o_ref[...] = jax.lax.dot_general(
        att.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    # Column sums for the valid mask — zero out padded q rows.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (RB, tq, wp), 1) + qi * tq
    att_valid = jnp.where(row_ids < w_true, att, 0.0)
    partial = jnp.sum(att_valid, axis=1)  # (RB, Wp)

    @pl.when(qi == 0)
    def _():
        cs_ref[...] = partial

    @pl.when(qi != 0)
    def _():
        cs_ref[...] = cs_ref[...] + partial


@functools.partial(jax.jit, static_argnames=("scale", "tq", "interpret", "precise"))
def row_attention_warp(q, k, v, scale, tq=64, interpret=False, precise=False):
    """out = softmax(q k^T * scale) @ v and colsum(att), fused.

    Args:
      q, k: (B, H, W, C); v: (B, H, W, Cv).
      scale: score scale (the reference uses 1/C, pasmnet/attention.py:41).
      interpret: run in the Pallas interpreter (CPU tests).

    Returns:
      out: (B, H, W, Cv) — attention-warped values (att_r2l @ v when called
        with q=left, k=v=right features).
      colsum: (B, H, W) — per-source-column attention mass; the reference's
        valid mask is ``colsum > 0.1`` of the *opposite* direction.
    """
    b, h, w, c = q.shape
    cv = v.shape[-1]
    tq = min(tq, _round_up(w, 8))
    wp = _round_up(w, tq)
    bh = b * h
    bhp = _round_up(bh, RB)

    # bf16 operand storage halves the kernel's VMEM working set (the K/V row
    # blocks dominate: RB*W*C*2 arrays); matmuls accumulate in f32 on the MXU.
    # ``precise=True`` keeps f32 operands for small widths (used by tests).
    op_dtype = jnp.float32 if precise else jnp.bfloat16

    def prep(x):
        flat = jnp.pad(
            x, [(0, 0), (0, 0), (0, wp - w), (0, 0)]
        ).reshape(bh, wp, x.shape[-1])
        return jnp.pad(flat, [(0, bhp - bh), (0, 0), (0, 0)]).astype(op_dtype)

    qf, kf, vf = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attention_kernel, scale=scale, w_true=w, tq=tq)

    out, colsum = pl.pallas_call(
        kernel,
        grid=(bhp // RB, wp // tq),
        in_specs=[
            pl.BlockSpec((RB, tq, c), lambda g, qi: (g, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, wp, c), lambda g, qi: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, wp, cv), lambda g, qi: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RB, tq, cv), lambda g, qi: (g, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, wp), lambda g, qi: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bhp, wp, cv), jnp.float32),
            jax.ShapeDtypeStruct((bhp, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:bh].reshape(b, h, wp, cv)[:, :, :w]
    colsum = colsum[:bh].reshape(b, h, wp)[:, :, :w]
    return out, colsum


def fused_parallax_inference(q_l, k_r, v_r, q_r, k_l, scale, interpret=False,
                             precise=False):
    """The DCMCS3DI inference matcher in two fused kernel calls:

      warped  = softmax(q_l k_r^T * scale) @ v_r          (feature warp)
      mask_l  = colsum(softmax(q_r k_l^T * scale)) > 0.1  (left valid mask)

    Equivalent to pasm.output(...)+pasm.warp(...) at inference
    (reference pasmnet/utils.py:30-40,:108-127) without materializing any
    (B, H, W, W) tensor.
    """
    warped, _ = row_attention_warp(
        q_l, k_r, v_r, scale, interpret=interpret, precise=precise
    )
    _, colsum = row_attention_warp(
        q_r, k_l, k_l, scale, interpret=interpret, precise=precise
    )
    valid_mask_left = (colsum > 0.1)[..., None]
    return warped, valid_mask_left
