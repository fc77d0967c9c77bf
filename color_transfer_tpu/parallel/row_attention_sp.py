"""Sequence-parallel parallax attention: shard image rows across the mesh.

The "long context" axis of this workload is image width/height — the
(B, H, W, W) cost volume (SURVEY.md §2.8 SP/CP row). Each image row's 1D
cross-view attention is independent, so sharding the H axis across devices
is embarrassingly parallel: no ring machinery, no collectives in the hot
loop — XLA just partitions the einsum/softmax over 'seq'. Combine with batch
('data') sharding on a 2D mesh for frames x rows parallelism when a frame
batch exceeds one chip's HBM.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from color_transfer_tpu.models import pasm


def row_sharding(mesh, axis_name="seq"):
    """Sharding that splits axis 1 (rows) of (B, H, W, C) tensors."""
    return NamedSharding(mesh, P(None, axis_name))


def sharded_parallax_inference(mesh, q_l, k_r, v_r, q_r, k_l, scale,
                               axis_name="seq"):
    """Row-sharded equivalent of ops.row_attention.fused_parallax_inference:
    warp = softmax(q_l k_r^T * scale) @ v_r and the left valid mask, with H
    partitioned over ``axis_name``. Uses the XLA path (materialized per-shard
    attention) — each device holds only H/n of the (B, H, W, W) volume."""
    shard = row_sharding(mesh, axis_name)
    q_l, k_r, v_r, q_r, k_l = (
        jax.device_put(x, shard) for x in (q_l, k_r, v_r, q_r, k_l)
    )

    @jax.jit
    def compute(q_l, k_r, v_r, q_r, k_l):
        att_r2l = jax.nn.softmax(
            jnp.einsum("bhwc,bhvc->bhwv", q_l, k_r) * scale, axis=-1
        )
        att_l2r = jax.nn.softmax(
            jnp.einsum("bhwc,bhvc->bhwv", q_r, k_l) * scale, axis=-1
        )
        warped = pasm.warp(v_r, att_r2l)
        valid_mask_left = (jnp.sum(att_l2r, axis=-2) > 0.1)[..., None]
        return warped, valid_mask_left

    return compute(q_l, k_r, v_r, q_r, k_l)
