"""Minimal standalone repro for a Mosaic (TPU Pallas) miscompile.

A one-hot table-select kernel — P/Q masks built by `broadcasted_iota`
compare on the LEADING (untiled) axis of a (16, mb, 128) block, table
row selected by `dot_general` contracting that leading axis — returns
~0.04% wrong elements when the block sublane size ``mb`` >= 64.  The
same kernel is bit-correct for mb in {8, 16, 32} and in interpret mode
at every size.  See MOSAIC_BUG.md for the full report.

Usage (on a real TPU):  python tools/mosaic_repro.py [mb ...]
Exit code 0 = all sizes correct, 1 = miscompile reproduced.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BINS = 255  # table entries; indices packed as i = 16*hi + lo


def kernel(x_ref, f_ref, out_ref):
    """out[s, l] = F[x[s, l]] via two 16-way one-hot selects.

    hi/lo one-hots live on the LEADING axis (TPU has no per-lane
    gather); the table row is selected by a leading-axis dot_general,
    the column by a masked leading-axis sum.
    """
    mb = x_ref.shape[0]
    hgrid = lax.broadcasted_iota(jnp.int32, (16, mb, LANES), 0)
    i = x_ref[...]  # (mb, 128) int32 in [0, BINS)
    hi = i // 16
    lo = i - hi * 16
    P = (hi[None] == hgrid).astype(jnp.float32)  # (16, mb, 128)
    Q = (lo[None] == hgrid).astype(jnp.float32)
    # S[h, s, l] = sum_g F[h, g] * Q[g, s, l]  -> S[h,:,:] = F[h, lo]
    S = lax.dot_general(
        f_ref[...], Q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    out_ref[...] = jnp.sum(P * S, axis=0)  # pick row hi -> F[16*hi+lo]


def run(mb, n_blocks=240, interpret=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, BINS, size=(n_blocks * mb, LANES)).astype(np.int32)
    )
    table = jnp.asarray(rng.uniform(0, 255, size=(BINS,)).astype(np.float32))
    f = jnp.pad(table, (0, 256 - BINS)).reshape(16, 16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((mb, LANES), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, LANES), lambda i: (i, 0)),
        interpret=interpret,
    )(x, f)
    want = table[x]  # XLA gather oracle
    bad = int(jnp.sum(jnp.abs(out - want) > 1e-6))
    return bad, x.size


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64, 128]
    print(f"jax {jax.__version__}, backend {jax.default_backend()}, "
          f"device {jax.devices()[0].device_kind}")
    failed = False
    for mb in sizes:
        bad, n = run(mb)
        bad_i, _ = run(mb, interpret=True)
        status = "OK" if bad == 0 else "MISCOMPILE"
        print(f"mb={mb:4d}: compiled {bad}/{n} wrong ({100*bad/n:.3f}%), "
              f"interpret {bad_i}/{n} wrong -> {status}")
        failed |= bad > 0
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
