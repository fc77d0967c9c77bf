"""Minimal repro of a Mosaic miscompile: leading-axis one-hot selection
kernels produce ~0.04% wrong elements when the block sublane size is >= 64.

Ready to file upstream (https://github.com/google/jax/issues — this
environment has no egress, so run + attach this script's output). Found
while building the IDT transport-apply kernel (methods/iterative.py, pinned
to 32-sublane blocks as the workaround; PERF.md r2).

Shape of the bug: for a (16, mb, 128) f32 one-hot tensor P built by
broadcast-compare against a leading-axis iota, the contraction
``sum(P * S, axis=0)`` (S also (16, mb, 128)) selects a ZEROED row for a
small fraction of (sublane, lane) positions when mb >= 64 — compiled output
disagrees with interpret mode on ~0.04% of elements; mb = 8/16/32 match
bitwise.

Usage (on a real TPU):

    python -m color_transfer_tpu.tools.mosaic_repro          # test mb grid
    python -m color_transfer_tpu.tools.mosaic_repro --mb 64  # single size
"""

import argparse
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_select_kernel(idx_ref, table_ref, out_ref):
    """out[s, l] = table[idx[s, l]] via a leading-axis one-hot contraction.

    idx: (mb, 128) int32 in [0, 16); table: (1, 16) f32; out: (mb, 128) f32.
    """
    mb = idx_ref.shape[0]
    hgrid = lax.broadcasted_iota(jnp.int32, (16, mb, 128), 0)
    P = (idx_ref[...][None] == hgrid).astype(jnp.float32)  # (16, mb, 128)
    values = table_ref[0][:, None, None]  # (16, 1, 1)
    out_ref[...] = jnp.sum(P * values, axis=0)


def run_once(mb, seed=0):
    rng = np.random.default_rng(seed)
    blocks = 8
    idx = rng.integers(0, 16, (blocks * mb, 128)).astype(np.int32)
    table = rng.normal(size=(1, 16)).astype(np.float32)

    call = functools.partial(
        pl.pallas_call,
        _onehot_select_kernel,
        out_shape=jax.ShapeDtypeStruct((blocks * mb, 128), jnp.float32),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((mb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (mb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    compiled = np.asarray(call()(jnp.asarray(idx), jnp.asarray(table)))
    expected = table[0][idx]  # numpy oracle
    bad = np.abs(compiled - expected) > 0
    return bad.mean(), compiled, expected


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mb", type=int, default=None)
    args = parser.parse_args()

    print(f"backend: {jax.default_backend()}")
    sizes = [args.mb] if args.mb else [8, 16, 32, 64, 128]
    for mb in sizes:
        frac, _, _ = run_once(mb)
        status = "OK" if frac == 0 else f"MISCOMPILE ({frac:.4%} wrong)"
        print(f"mb={mb:4d}: {status}")


if __name__ == "__main__":
    main()
