"""Pallas halo stencil for the regrain Jacobi sweeps.

Reference op: methods/iterative.py:106-113 (reference) — per pyramid level,
``nbit`` damped-Jacobi sweeps of a 4-neighbour edge-replicate stencil:

    out <- (1-rho) * (const + phi1*L(out) + phi2*U(out) + phi3*R(out)
                      + phi4*D(out)) / den + rho * out

The XLA path launches each sweep as a separate fused elementwise program:
at the small pyramid levels (which carry most of the sweeps — nbits =
(4,16,32,64,64,64) runs 64 sweeps at the tiny levels) launch/HBM overhead
dominates. This kernel keeps the level's out/const/phi/inv_den arrays
VMEM-resident in PLANAR layout (channels on the untiled leading axis — a
channels-last (H, W, 3) VMEM buffer would pad 3 lanes to 128) and runs all
``nbit`` sweeps in one launch, shifting neighbours with in-register
lane/sublane rolls plus boundary masks for the edge-replicate semantics.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(out0_ref, const_ref, phi_ref, invd_ref, out_ref, *,
                  nbit, rho, h, w):
    """out0/const: (3, H, W); phi: (4, H, W) = [phi1(L), phi2(U), phi3(R),
    phi4(D)]; invd: (1, H, W) = (1-rho)/den; out: (3, H, W)."""
    xi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    yi = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    last_col = (xi == w - 1)[None]
    first_col = (xi == 0)[None]
    last_row = (yi == h - 1)[None]
    first_row = (yi == 0)[None]

    out_ref[...] = out0_ref[...]
    const = const_ref[...]
    p1 = phi_ref[0][None]
    p2 = phi_ref[1][None]
    p3 = phi_ref[2][None]
    p4 = phi_ref[3][None]
    invd = invd_ref[...]

    def sweep(_, carry):
        out = out_ref[...]
        # Edge-replicate shifts: roll then pin the wrapped border back to
        # the centre value (replicated edge == no displacement there).
        # pltpu.roll requires non-negative shifts: roll by size-1 == -1.
        left = jnp.where(last_col, out, pltpu.roll(out, w - 1, 2))
        right = jnp.where(first_col, out, pltpu.roll(out, 1, 2))
        up = jnp.where(last_row, out, pltpu.roll(out, h - 1, 1))
        down = jnp.where(first_row, out, pltpu.roll(out, 1, 1))
        num = const + p1 * left + p2 * up + p3 * right + p4 * down
        out_ref[...] = num * invd + rho * out
        return carry

    jax.lax.fori_loop(0, nbit, sweep, 0)


@functools.partial(
    jax.jit, static_argnames=("nbit", "rho", "interpret")
)
def regrain_sweeps_pallas(img_out, const, phis, inv_den, nbit, rho=0.2,
                          interpret=False):
    """All ``nbit`` Jacobi sweeps of one pyramid level in one kernel launch.

    img_out/const: (H, W, 3); phis: (4, H, W); inv_den: (H, W) holding
    (1-rho)/den. Returns (H, W, 3) — identical (up to f32 rounding order)
    to the XLA fori_loop path in methods/iterative.py::_solve.
    """
    h, w, _ = img_out.shape
    planar = lambda x: jnp.moveaxis(x, -1, 0)  # (3, H, W)

    out = pl.pallas_call(
        functools.partial(_sweep_kernel, nbit=nbit, rho=rho, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((3, h, w), img_out.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(planar(img_out), planar(const), phis, inv_den[None])
    return jnp.moveaxis(out, 0, -1)


def level_fits_vmem(h, w, budget_bytes=64 * 1024 * 1024):
    """Conservative VMEM estimate for one level's resident arrays: out +
    out0 + const (3ch each) + 4 phis + inv_den + register headroom, lanes
    padded to 128 and sublanes to 8."""
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    per_plane = hp * wp * 4
    return (3 * 3 + 4 + 1 + 3) * per_plane < budget_bytes
