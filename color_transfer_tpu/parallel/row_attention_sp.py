"""Sequence-parallel parallax attention: shard image rows across the mesh.

The "long context" axis of this workload is image width/height — the
(B, H, W, W) cost volume (SURVEY.md §2.8 SP/CP row). Each image row's 1D
cross-view attention is independent, so sharding the H axis across devices
is embarrassingly parallel: no ring machinery, no collectives in the hot
loop — XLA just partitions the einsum/softmax over 'seq'. Combine with batch
('data') sharding on a 2D mesh for frames x rows parallelism when a frame
batch exceeds one chip's HBM.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from color_transfer_tpu.models import pasm


def row_sharding(mesh, axis_name="seq"):
    """Sharding that splits axis 1 (rows) of (B, H, W, C) tensors."""
    return NamedSharding(mesh, P(None, axis_name))


def image_sharding(mesh, data_axis="data", seq_axis="seq"):
    """(B, H, W, C) sharding: frames over 'data', image rows over 'seq'."""
    return NamedSharding(mesh, P(data_axis, seq_axis))


@functools.lru_cache(maxsize=8)
def _sharded_eval_fn(model, mesh, data_axis, seq_axis):
    shard = image_sharding(mesh, data_axis, seq_axis)
    rep = NamedSharding(mesh, P())

    def forward(params, target, reference):
        out, _ = model.apply({"params": params}, target, reference,
                             inference=True)
        return out

    return jax.jit(
        forward,
        in_shardings=(rep, shard, shard),
        out_shardings=shard,
    )


def sharded_eval_forward(module, params, batch, mesh, data_axis="data",
                         seq_axis="seq"):
    """End-to-end DCMCS3DI inference over a 2D ('data', 'seq') mesh.

    Frames shard over ``data_axis`` and image ROWS over ``seq_axis`` — the
    (B, H, W, W) cost volume is partitioned along H by GSPMD (each device
    materializes only H/n_seq of it), and XLA inserts the conv halo
    exchanges for the extraction/transfer stacks over ICI automatically.
    This is the scale-out big-frame serving path; the Pallas fused kernel
    (ops/row_attention.py) is the single-chip one. Matches the unsharded
    eval_forward output (tests/test_row_sharded.py).
    """
    fn = _sharded_eval_fn(module.model, mesh, data_axis, seq_axis)
    shard = image_sharding(mesh, data_axis, seq_axis)
    target = jax.device_put(batch["target"], shard)
    reference = jax.device_put(batch["reference"], shard)
    return fn(params, target, reference)


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
    # Module-level jit (scale static): a per-call closure would never hit
    # the jit cache and recompile on every serving invocation.
    return _sp_attention_compute(q_l, k_r, v_r, q_r, k_l, scale=scale)


@functools.partial(jax.jit, static_argnames=("scale",))
def _sp_attention_compute(q_l, k_r, v_r, q_r, k_l, scale):
    att_r2l = jax.nn.softmax(
        jnp.einsum("bhwc,bhvc->bhwv", q_l, k_r) * scale, axis=-1
    )
    att_l2r = jax.nn.softmax(
        jnp.einsum("bhwc,bhvc->bhwv", q_r, k_l) * scale, axis=-1
    )
    warped = pasm.warp(v_r, att_r2l)
    valid_mask_left = (jnp.sum(att_l2r, axis=-2) > 0.1)[..., None]
    return warped, valid_mask_left
