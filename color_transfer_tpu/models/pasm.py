"""Parallax attention (PASM) — the matcher inside DCMCS3DI.

TPU-first re-design of the reference's PAM modules (reference
pasmnet/attention.py, pasmnet/utils.py, pasmnet/losses.py). Everything is
NHWC; the cost volumes are (B, H, W, W) row-wise cross-view attention —
einsum contractions that XLA tiles straight onto the MXU. The Pallas
flash-style row-attention kernel (ops/pallas/row_attention.py) replaces the
materialized softmax+warp at inference; training keeps the materialized maps
because the cycle/smoothness losses consume the full attention tensors
(reference pasmnet/losses.py:24-46).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from color_transfer_tpu.models.layers import Conv, ResB


class PAB(nn.Module):
    """Parallax attention block: shared ResB head + 1x1 Q/K/V convs building
    two (B, H, W, W) cost volumes (reference pasmnet/attention.py:9-48)."""

    channels: int

    def setup(self):
        self.head = ResB(self.channels)
        self.query = Conv(self.channels, kernel_size=1)
        self.key = Conv(self.channels, kernel_size=1)
        self.value = Conv(self.channels, kernel_size=1)

    def __call__(self, x_left, x_right):
        c = self.channels
        # Shared weights -> both views ride one batch-concatenated pass
        # through the head and each 1x1 projection (3 conv dispatches
        # instead of 6; batch rows are independent so numerics are
        # identical to per-view application).
        fea = self.head(jnp.concatenate([x_left, x_right], axis=0))
        q_l, q_r = jnp.split(self.query(fea), 2, axis=0)
        k_l, k_r = jnp.split(self.key(fea), 2, axis=0)

        # Row-wise QK^T over the width axis, scaled by channel count
        # (reference pasmnet/attention.py:39-46).
        cost_right2left = jnp.einsum("bhwc,bhvc->bhwv", q_l, k_r) / c
        cost_left2right = jnp.einsum("bhwc,bhvc->bhwv", q_r, k_l) / c
        return cost_right2left, cost_left2right

    def value_features(self, x):
        return self.value(x)


def output(costs, inference=False, valid_w=None):
    """Masked softmax over cost volumes -> attention maps, cycle maps and
    valid masks (reference pasmnet/utils.py:8-52).

    Returns ((att_r2l, att_l2r), (cycle_l, cycle_r), (mask_l, mask_r));
    at inference the cycle maps and right mask are None (reference :37-40).
    Valid masks are (B, H, W, 1) boolean — channel-last counterpart of the
    reference's (B, 1, H, W).

    valid_w: true image width under eval-shape bucketing. Padded QUERY rows
    (index >= valid_w) still softmax to unit mass and would inject it into
    the valid-mask column sums, flipping matched/unmatched pixels anywhere
    in the image; exclude them from the sums.
    """
    cost_right2left, cost_left2right = costs

    att_right2left = jax.nn.softmax(cost_right2left, axis=-1)
    att_left2right = jax.nn.softmax(cost_left2right, axis=-1)

    if valid_w is None:
        row_keep = None
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, att_left2right.shape, 2)
        row_keep = (row < valid_w).astype(att_left2right.dtype)

    def colsum(att):
        att = jax.lax.stop_gradient(att)
        if row_keep is not None:
            att = att * row_keep
        return jnp.sum(att, axis=-2)

    # Column sums of the detached attention: how much each source column is
    # referenced; > 0.1 == matched (reference :34).
    valid_mask_left = (colsum(att_left2right) > 0.1)[..., None]

    if inference:
        return (att_right2left, att_left2right), (None, None), (valid_mask_left, None)

    valid_mask_right = (colsum(att_right2left) > 0.1)[..., None]

    att_left2right2left = jnp.einsum(
        "bhwv,bhvu->bhwu", att_right2left, att_left2right
    )
    att_right2left2right = jnp.einsum(
        "bhwv,bhvu->bhwu", att_left2right, att_right2left
    )

    return (
        (att_right2left, att_left2right),
        (att_left2right2left, att_right2left2right),
        (valid_mask_left, valid_mask_right),
    )


def warp(image, att):
    """Apply a matching attention map: (B,H,W,W) @ (B,H,W,C) -> (B,H,W,C)
    (reference pasmnet/utils.py:108-127, without the NCHW permutes)."""
    return jnp.einsum("bhwv,bhvc->bhwc", att, image)


def regress_disp(att, valid_mask):
    """Expected disparity + occlusion in-painting (reference
    pasmnet/utils.py:55-105). Visualization-only.

    The reference in-paints with data-dependent ``while`` loops of 1D partial
    convolutions until the valid mask saturates; each pass extends validity
    by >=1 pixel along the width, so W iterations always suffice — here a
    bounded ``lax.while_loop`` with the same stopping rule.

    att: (B, H, W, W); valid_mask: (B, H, W, 1) float. Returns (B, H, W, 1).
    """
    b, h, w, _ = att.shape
    index = jnp.arange(w, dtype=att.dtype)
    disp_ini = index[None, None, :] - jnp.einsum("bhwv,v->bhw", att, index)
    disp_ini = disp_ini[..., None]

    mask0 = valid_mask
    disp0 = disp_ini * mask0

    def shift_l(x):  # value at w+1 (zero-padded), like conv with [0,1,1] tap
        return jnp.concatenate([x[:, :, 1:], jnp.zeros_like(x[:, :, :1])], axis=2)

    def shift_r(x):
        return jnp.concatenate([jnp.zeros_like(x[:, :, :1]), x[:, :, :-1]], axis=2)

    def inpaint(disp, mask, taps):
        """One partial-convolution sweep with the given neighbour taps."""

        def cond(state):
            _, mask_cur, grew = state
            return grew > 0

        def body(state):
            disp_cur, mask_cur, _ = state
            neigh_mask = mask_cur
            neigh_disp = disp_cur
            for tap in taps:
                neigh_mask = neigh_mask + tap(mask_cur)
                neigh_disp = neigh_disp + tap(disp_cur)
            new_valid = (neigh_mask > 0).astype(disp_cur.dtype)
            filled = neigh_disp / (neigh_mask + 1e-4)
            disp_next = disp_cur * mask_cur + filled * (new_valid - mask_cur)
            grew = jnp.sum(new_valid) - jnp.sum(mask_cur)
            return disp_next, new_valid, grew

        disp, mask, _ = jax.lax.while_loop(cond, body, (disp, mask, jnp.float32(1)))
        return disp, mask

    # Reference filter1 = [1,1,0] (left+self), filter2 = [0,1,1] (self+right).
    disp1, mask1 = inpaint(disp0, mask0, [shift_r])
    disp2, _ = inpaint(disp1, mask1, [shift_l])

    return disp_ini * valid_mask + disp2 * (1.0 - valid_mask)


# --- PAM losses (reference pasmnet/losses.py) ---


def masked_l1(x, y, mask):
    mask = mask.astype(x.dtype)
    return jnp.sum(jnp.abs(x - y) * mask) / jnp.sum(mask)


def loss_pam_photometric(img_left, img_right, att, valid_mask):
    att_right2left, att_left2right = att
    valid_mask_left, valid_mask_right = valid_mask
    return masked_l1(img_left, warp(img_right, att_right2left), valid_mask_left) + (
        masked_l1(img_right, warp(img_left, att_left2right), valid_mask_right)
    )


def loss_pam_cycle(att_cycle, valid_mask):
    att_l2r2l, att_r2l2r = att_cycle
    valid_mask_left, valid_mask_right = valid_mask
    w = att_l2r2l.shape[-1]
    eye = jnp.eye(w, dtype=att_l2r2l.dtype)
    # Mask is (B,H,W,1) and broadcasts over the last attention axis, matching
    # the reference's permute(0,2,3,1) layout trick (pasmnet/losses.py:32-33).
    return masked_l1(att_l2r2l, eye, valid_mask_left) + masked_l1(
        att_r2l2r, eye, valid_mask_right
    )


def loss_pam_smoothness(att):
    att_r2l, att_l2r = att

    def smooth(a):
        return jnp.mean(jnp.abs(a[:, :-1] - a[:, 1:])) + jnp.mean(
            jnp.abs(a[:, :, :-1, :-1] - a[:, :, 1:, 1:])
        )

    return smooth(att_r2l) + smooth(att_l2r)
