"""Multi-host initialization and DCN-sharded input (SURVEY.md §2.8 comm row).

Single-slice TPU jobs need nothing here — the mesh covers local devices and
collectives ride ICI. Across hosts (multi-slice / multi-host pods), JAX needs
``jax.distributed.initialize`` before any backend touch, after which
``jax.devices()`` is global and a Mesh over it routes inter-host collectives
over DCN. Input parallelism: each host loads ONLY its shard of the global
batch (`host_batch_slice`) and `global_batch_from_host_shards` assembles the
logical global array without any host ever materializing the full batch.

Exercised by tests/test_multihost.py: a real 2-process CPU run over the
loopback coordinator, and the single-process no-op path.
"""

import os

import jax
import numpy as np


def initialize_distributed(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    local_device_ids=None,
):
    """Initialize JAX's multi-process runtime; no-op for single-process runs.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so cluster launchers can configure
    the run without code changes. Returns (process_id, num_processes).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))

    if num_processes <= 1:
        return 0, 1  # single-process: nothing to initialize
    if coordinator_address is None:
        # Never degrade an explicitly multi-process launch to N independent
        # single-host runs (duplicate training, clobbered checkpoints).
        raise ValueError(
            f"num_processes={num_processes} requested but no coordinator "
            "address given (set JAX_COORDINATOR_ADDRESS or pass "
            "coordinator_address)"
        )

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_index(), jax.process_count()


def host_batch_slice(global_batch_size, process_id=None, num_processes=None):
    """The [start, stop) rows of the global batch this host should load."""
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    assert global_batch_size % num_processes == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{num_processes} processes"
    )
    per_host = global_batch_size // num_processes
    return process_id * per_host, (process_id + 1) * per_host


def global_batch_from_host_shards(local_batch, mesh, axis_name="data"):
    """Assemble a global batch-sharded pytree from per-host local shards.

    Each process passes only ITS rows (host_batch_slice of the loader
    output); the result is a jax.Array whose global shape covers all hosts,
    batch axis sharded over ``axis_name`` — no host ever holds the full
    batch (the DCN input-parallelism pattern).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    def to_global(x):
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P(axis_name)
        )

    return jax.tree_util.tree_map(to_global, local_batch)
