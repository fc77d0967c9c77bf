"""Device mesh and sharding helpers — the framework's distributed backbone.

The reference has no explicit distributed code (SURVEY.md §2.8): Lightning
DDP would own NCCL if enabled. The TPU-native equivalent is XLA collectives
over ICI, expressed through a ``jax.sharding.Mesh`` + ``NamedSharding``; this
module is the thin layer every training/eval loop goes through.

Axes convention:
  * ``data``  — batch / frame axis (the primary parallelism for this
    workload: frames of a stereo video are independent).
  * ``seq``   — optional second axis to shard image rows of the (B,H,W,W)
    parallax-attention cost volume across devices (each image row's 1D
    cross-view attention is independent — SURVEY.md §2.8 SP/CP row).

Metric reduction uses jnp means over sharded arrays — XLA inserts the
psum/all-reduce over ICI automatically (the `sync_dist=True` equivalent of
reference methods/dcmcs3di.py:79-90).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape=None, axis_names=("data",), devices=None):
    """Build a Mesh over the available devices.

    Args:
      shape: mesh shape tuple; defaults to (n_devices,) over one axis.
      axis_names: names for each mesh axis.
      devices: explicit device list (defaults to jax.devices()).
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh, ndim, axis_name="data"):
    """NamedSharding that splits axis 0 (batch) across ``axis_name``."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name="data"):
    """Place a pytree of batched arrays with the batch axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name)), batch
    )
