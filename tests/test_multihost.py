"""Multi-host staging (parallel/multihost.py): single-process no-op path
in-process, plus a REAL 2-process CPU run over the loopback coordinator in
subprocesses (each with 1 virtual CPU device) doing a cross-host psum."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

from color_transfer_tpu.parallel import multihost

REPO = Path(__file__).resolve().parents[1]


class TestSingleProcess:
    def test_initialize_noop(self):
        pid, n = multihost.initialize_distributed()
        assert (pid, n) == (0, 1)

    def test_host_batch_slice(self):
        assert multihost.host_batch_slice(8, 0, 2) == (0, 4)
        assert multihost.host_batch_slice(8, 1, 2) == (4, 8)
        with pytest.raises(AssertionError):
            multihost.host_batch_slice(9, 0, 2)

    def test_global_batch_single_process(self):
        import jax
        from color_transfer_tpu.parallel import create_mesh

        mesh = create_mesh()
        local = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
        global_batch = multihost.global_batch_from_host_shards(local, mesh)
        assert global_batch["x"].shape == (8, 2)
        np.testing.assert_array_equal(np.asarray(global_batch["x"]), local["x"])


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "@REPO@")

    from jax.sharding import PartitionSpec as P
    import jax.numpy as jnp
    import numpy as np

    from color_transfer_tpu.parallel import create_mesh, multihost

    pid, n = multihost.initialize_distributed(
        coordinator_address="@COORD@",
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    assert n == 2, n
    devices = jax.devices()
    assert len(devices) == 2, devices  # one CPU device per process, global

    mesh = create_mesh(devices=devices)
    start, stop = multihost.host_batch_slice(4)
    local_rows = np.arange(4, dtype=np.float32).reshape(4, 1)[start:stop]
    global_x = multihost.global_batch_from_host_shards({"x": local_rows}, mesh)["x"]
    assert global_x.shape == (4, 1), global_x.shape

    total = jax.jit(lambda x: jnp.sum(x))(global_x)
    assert float(total) == 6.0, float(total)
    print(f"OK process {pid}")
    """
)


def test_two_process_cpu_psum(tmp_path):
    """Two real processes, loopback coordinator, global mesh over 2 CPU
    devices, cross-host reduction of a host-sharded batch."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(
        _WORKER.replace("@REPO@", str(REPO)).replace("@COORD@", coord)
    )

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # exactly 1 CPU device per process

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK process {i}" in out
