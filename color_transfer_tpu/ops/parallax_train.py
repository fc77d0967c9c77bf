"""Memory-bounded TRAINING-time parallax attention.

The reference's training step materializes four (B, H, W, W) attention
volumes — att_r2l, att_l2r and both cycle products — because the PAM losses
consume them (reference pasmnet/utils.py:28-52, pasmnet/losses.py:10-46).
That sets a hard HBM ceiling on crop size/batch (SURVEY.md §7 hard part #4).

This module computes the SAME forward outputs and loss reductions chunked
over image rows with ``lax.scan`` + ``jax.checkpoint``: each scan step holds
only (B, chunk, W, W) score tiles, the loss terms are reduced to scalar
accumulators inside the scan, and the backward pass recomputes the chunk's
attention instead of storing it (the custom-VJP-by-recompute pattern,
expressed through XLA's remat instead of a handwritten Pallas backward — the
matmuls already run at MXU speed under XLA).

Peak attention memory drops from O(B*H*W^2) to O(B*chunk*W^2): for the
reference recipe (batch 8 @ 160x320 crops, configs/dcmcs3di.yaml:12-17) that
is 524 MB -> 26 MB per volume, lifting the crop-size ceiling ~H/chunk x.

Row coupling: every PAM loss term is per-row except the H-direction
smoothness shift (|att[:, h+1] - att[:, h]|, reference pasmnet/losses.py:42),
which is handled by carrying the previous chunk's last attention row through
the scan carry.

Gradient-parity with the materialized path is asserted in
tests/test_parallax_train.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pick_chunk(h, wanted):
    chunk = min(wanted, h)
    while h % chunk:
        chunk -= 1
    return chunk


@functools.partial(jax.jit, static_argnames=("scale", "chunk"))
def chunked_parallax_train(q_l, k_l, q_r, k_r, v_r, img_l, img_r, scale,
                           chunk=8):
    """Fused training matcher: attention warp + valid masks + PAM losses.

    Args:
      q_l, k_l, q_r, k_r: (B, H, W, C) query/key features per view.
      v_r: (B, H, W, Cv) value features of the right view.
      img_l, img_r: (B, H, W, 3) the target/reference images (photometric
        loss operands, reference pasmnet/losses.py:14-21).
      scale: score scale (1/C in the reference, pasmnet/attention.py:41).
      chunk: rows per scan step (reduced to a divisor of H).

    Returns:
      warped_v: (B, H, W, Cv) = att_r2l @ v_r.
      valid_mask_left, valid_mask_right: (B, H, W, 1) bool.
      losses: dict with 'photometric', 'cycle', 'smoothness' scalars — the
        UNWEIGHTED reference losses (caller applies the 0.005 factors,
        reference methods/dcmcs3di.py:75-77).
    """
    b, h, w, _ = q_l.shape
    cv = v_r.shape[-1]
    chunk = _pick_chunk(h, chunk)
    n = h // chunk

    def to_chunks(x):
        return jnp.moveaxis(
            x.reshape(b, n, chunk, w, x.shape[-1]), 1, 0
        )  # (n, B, chunk, W, D)

    xs = tuple(
        to_chunks(x) for x in (q_l, k_l, q_r, k_r, v_r, img_l, img_r)
    )
    xs = xs + (jnp.arange(n),)

    eye = jnp.eye(w, dtype=q_l.dtype)

    zero = jnp.zeros((), jnp.float32)
    acc0 = {
        "pm_num_l": zero, "pm_num_r": zero,
        "den_l": zero, "den_r": zero,
        "cyc_num_l": zero, "cyc_num_r": zero,
        "sm_h": zero, "sm_w": zero,
    }
    carry0 = (
        acc0,
        jnp.zeros((b, w, w), q_l.dtype),  # previous chunk's last att_r2l row
        jnp.zeros((b, w, w), q_l.dtype),  # previous chunk's last att_l2r row
    )

    def body(carry, x):
        acc, prev_r2l, prev_l2r = carry
        ql, kl, qr, kr, vr, il, ir, idx = x

        att_r2l = jax.nn.softmax(
            jnp.einsum("bhwc,bhvc->bhwv", ql, kr) * scale, axis=-1
        )
        att_l2r = jax.nn.softmax(
            jnp.einsum("bhwc,bhvc->bhwv", qr, kl) * scale, axis=-1
        )

        # Valid masks from detached column sums (reference pasmnet/utils.py:34).
        mask_l = (
            jnp.sum(lax.stop_gradient(att_l2r), axis=-2) > 0.1
        )  # (B, chunk, W)
        mask_r = jnp.sum(lax.stop_gradient(att_r2l), axis=-2) > 0.1
        mask_l_f = mask_l.astype(jnp.float32)
        mask_r_f = mask_r.astype(jnp.float32)

        warped_v = jnp.einsum("bhwv,bhvc->bhwc", att_r2l, vr)

        # Photometric numerators (masked L1 against the attention-warped
        # other view, reference pasmnet/losses.py:14-21).
        warp_ir = jnp.einsum("bhwv,bhvc->bhwc", att_r2l, ir)
        warp_il = jnp.einsum("bhwv,bhvc->bhwc", att_l2r, il)
        pm_num_l = jnp.sum(jnp.abs(il - warp_ir) * mask_l_f[..., None])
        pm_num_r = jnp.sum(jnp.abs(ir - warp_il) * mask_r_f[..., None])

        # Cycle numerators: |att_a @ att_b - I| masked per target row
        # (reference pasmnet/losses.py:24-34).
        cyc_l = jnp.einsum("bhwv,bhvu->bhwu", att_r2l, att_l2r)
        cyc_r = jnp.einsum("bhwv,bhvu->bhwu", att_l2r, att_r2l)
        cyc_num_l = jnp.sum(jnp.abs(cyc_l - eye) * mask_l_f[..., None])
        cyc_num_r = jnp.sum(jnp.abs(cyc_r - eye) * mask_r_f[..., None])

        # Smoothness sums (reference pasmnet/losses.py:37-46): H-shift —
        # intra-chunk plus the boundary row against the previous chunk — and
        # the diagonal W-shift.
        def sm_sums(att, prev_last):
            intra = jnp.sum(jnp.abs(att[:, 1:] - att[:, :-1]))
            boundary = jnp.where(
                idx > 0, jnp.sum(jnp.abs(att[:, 0] - prev_last)), 0.0
            )
            diag = jnp.sum(jnp.abs(att[:, :, :-1, :-1] - att[:, :, 1:, 1:]))
            return intra + boundary, diag

        sm_h_a, sm_w_a = sm_sums(att_r2l, prev_r2l)
        sm_h_b, sm_w_b = sm_sums(att_l2r, prev_l2r)

        acc = {
            "pm_num_l": acc["pm_num_l"] + pm_num_l,
            "pm_num_r": acc["pm_num_r"] + pm_num_r,
            "den_l": acc["den_l"] + jnp.sum(mask_l_f),
            "den_r": acc["den_r"] + jnp.sum(mask_r_f),
            "cyc_num_l": acc["cyc_num_l"] + cyc_num_l,
            "cyc_num_r": acc["cyc_num_r"] + cyc_num_r,
            "sm_h": acc["sm_h"] + sm_h_a + sm_h_b,
            "sm_w": acc["sm_w"] + sm_w_a + sm_w_b,
        }
        out = (warped_v, mask_l, mask_r)
        return (acc, att_r2l[:, -1], att_l2r[:, -1]), out

    (acc, _, _), (warped_v, mask_l, mask_r) = lax.scan(
        jax.checkpoint(body), carry0, xs
    )

    def from_chunks(x):
        return jnp.moveaxis(x, 0, 1).reshape(b, h, w, *x.shape[4:])

    warped_v = from_chunks(warped_v).reshape(b, h, w, cv)
    valid_mask_left = from_chunks(mask_l[..., None])
    valid_mask_right = from_chunks(mask_r[..., None])

    losses = {
        "photometric": acc["pm_num_l"] / acc["den_l"]
        + acc["pm_num_r"] / acc["den_r"],
        "cycle": acc["cyc_num_l"] / acc["den_l"]
        + acc["cyc_num_r"] / acc["den_r"],
        # Means over the shifted tensors' true element counts
        # (F.l1_loss reduction='mean', reference pasmnet/losses.py:42-45).
        "smoothness": acc["sm_h"] / (b * (h - 1) * w * w)
        + acc["sm_w"] / (b * h * (w - 1) * (w - 1)),
    }
    return warped_v, valid_mask_left, valid_mask_right, losses
