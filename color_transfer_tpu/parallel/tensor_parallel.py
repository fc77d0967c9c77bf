"""Tensor parallelism for the matcher transformer (GSPMD weight sharding).

The DMSCT/GMFlow matcher's FLOPs concentrate in the transformer's
projection and FFN matmuls (PERF.md). This module shards those weight
matrices over a mesh 'model' axis in the standard Megatron pairing —
column-parallel producer (q/k/v and mlp_0 split on the OUTPUT feature
axis) feeding a row-parallel consumer (merge and mlp_2 split on the INPUT
feature axis) — and lets GSPMD propagate: each pair costs one
reduce(-scatter)/all-reduce on the C-wide activations instead of any
weight gathering, riding ICI.

This composes with data parallelism: pass a 2D (data, model) mesh and
shard the batch on 'data' as usual. The backbone/refiner convs stay
replicated (they are memory-light; channel-sharding 3x3 convs buys
little at C=128).

Scope note: at this model's size (d_model=128) TP is not a single-chip
memory necessity — it is the serving-latency lever (splits the matmul
wall-clock across chips when one frame's latency matters more than
throughput) and the demonstrated scale-out path for wider transformer
configs. Reference counterpart: none (the torch stack is single-GPU;
SURVEY.md §2.8).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _is_transformer_path(path):
    keys = [getattr(p, "key", None) for p in path]
    return any(k == "transformer" for k in keys)


def matcher_tp_shardings(params, mesh, axis="model"):
    """A pytree of NamedShardings for a GMFlow/UniMatchFlow param tree:
    transformer projection/FFN kernels sharded over ``axis``, everything
    else replicated.

    Column-parallel (output axis sharded): q_proj, k_proj, v_proj, mlp_0.
    Row-parallel (input axis sharded): merge, mlp_2. LayerNorms and all
    non-transformer params replicate.
    """
    col = {"q_proj", "k_proj", "v_proj", "mlp_0"}
    row = {"merge", "mlp_2"}

    def spec_for(path, leaf):
        if _is_transformer_path(path):
            keys = [getattr(p, "key", None) for p in path]
            if keys[-1] == "kernel" and leaf.ndim == 2:
                name = keys[-2]
                if name in col:
                    return P(None, axis)
                if name in row:
                    return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params
    )


def shard_matcher_params(params, mesh, axis="model"):
    """Place a matcher param tree according to :func:`matcher_tp_shardings`."""
    return jax.device_put(params, matcher_tp_shardings(params, mesh, axis))
