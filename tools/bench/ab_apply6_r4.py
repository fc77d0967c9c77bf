"""Apply-kernel A/B, final round. Discovery: under jit this backend ELIDES
f32->bf16->f32 cast round-trips, so every historical "bf16 hi/lo split"
table packing (including round 2's production kernel) silently degenerated
to a single DEFAULT one-pass dot with a ~0.5-bin first-order error — fast
(11.7 ms vmapped) but not the exact kernel anyone thought was running.
``lax.reduce_precision`` is not elidable; this measures the TRUE variants:

  default1    — 1 DEFAULT dot per select: the fast floor, 0.5-bin error.
  split2rp    — true 2-way split (reduce_precision): ~1e-3-bin error.
  split3rp    — true 3-way split: exact to ~2e-6 bins.
  split2rp_b  — split2rp with operands pre-cast to bf16 (same numerics,
                half the MXU ingest bytes).
  split3rp_b  — split3rp with bf16 operands.
  highest     — r3 production: exact, catastrophic under vmap (112 ms).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import color_transfer_tpu.methods.iterative as it

print("backend:", jax.default_backend(), flush=True)

VARIANTS = (
    "default1", "split2rp", "split3rp", "split2rp_b", "split3rp_b", "highest"
)


def make_kernel(variant):
    nparts = {"default1": 1, "split2rp": 2, "split3rp": 3,
              "split2rp_b": 2, "split3rp_b": 3, "highest": 1}[variant]
    bf16ops = variant.endswith("_b")

    def kern(scal_ref, x_ref, g_ref, out_ref):
        mb = x_ref.shape[1]
        hgrid = lax.broadcasted_iota(jnp.int32, (16, mb, 128), 0)
        n = 255
        for a in range(3):
            grid_lo = scal_ref[a, 0]
            step = scal_ref[a, 1]
            right_edge = scal_ref[a, 2]
            x = x_ref[a]
            pos = (x - grid_lo) / step
            i = jnp.clip(jnp.floor(pos), 0, n - 2).astype(jnp.int32)
            frac = pos - i.astype(jnp.float32)
            hi = i // 16
            lo = i - hi * 16
            P = (hi[None] == hgrid).astype(jnp.float32)
            qdt = jnp.bfloat16 if bf16ops else jnp.float32
            Q = (lo[None] == hgrid).astype(qdt)

            def dot(F, prec=None):
                return lax.dot_general(
                    F, Q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    **({"precision": prec} if prec else {}),
                )

            def sel(k0):
                if variant == "highest":
                    s = dot(g_ref[a, k0], lax.Precision.HIGHEST)
                else:
                    s = dot(g_ref[a, k0])
                    for j in range(1, nparts):
                        s = s + dot(g_ref[a, k0 + j])
                return jnp.sum(P * s, axis=0)

            v0 = sel(0)
            v1 = sel(nparts)
            val = v0 * (1.0 - frac) + v1 * frac
            val = jnp.where(x < grid_lo, 0.0, val)
            val = jnp.where(x > right_edge, float(n), val)
            out_ref[a] = val

    return kern


def pack_tables(fp, variant):
    nparts = {"default1": 1, "split2rp": 2, "split3rp": 3,
              "split2rp_b": 2, "split3rp_b": 3, "highest": 1}[variant]
    bf16ops = variant.endswith("_b")
    fp_next = jnp.concatenate([fp[:, 1:], fp[:, -1:]], axis=1)

    def grid16(t):
        return jnp.pad(t, ((0, 0), (0, 256 - fp.shape[1]))).reshape(3, 16, 16)

    def parts(t):
        t = grid16(t)
        out = []
        rem = t
        for _ in range(nparts - 1):
            p = lax.reduce_precision(rem, exponent_bits=8, mantissa_bits=7)
            out.append(p)
            rem = rem - p
        out.append(rem)
        return out

    g = jnp.stack([*parts(fp), *parts(fp_next)], axis=1)
    return g.astype(jnp.bfloat16) if bf16ops else g


def runner(variant):
    def apply_tables(d0, grid_lo, step, fp, right_edge):
        _, n_pix = d0.shape
        blk = 32 * 128
        n_pad = -(-n_pix // blk) * blk
        x = jnp.pad(d0, ((0, 0), (0, n_pad - n_pix))).reshape(
            3, n_pad // 128, 128
        )
        g = pack_tables(fp, variant)
        scal = jnp.stack(
            [grid_lo, step, right_edge, jnp.zeros_like(step)], axis=1
        ).astype(jnp.float32)
        out = pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            grid=(x.shape[1] // 32,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((3, 32, 128), lambda i: (0, i, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, 32, 128), lambda i: (0, i, 0)),
        )(scal, x, g)
        return out.reshape(3, n_pad)[:, :n_pix]

    return apply_tables


rng = np.random.default_rng(0)
d0s = jnp.asarray(rng.uniform(-3, 3, size=(3, 32 * 128 * 3)).astype(np.float32))
fps_ = jnp.asarray(
    np.sort(rng.uniform(0, 255, size=(3, 255)), axis=1).astype(np.float32)
)
los = jnp.asarray([-3.0, -2.5, -3.5])
steps = jnp.asarray([0.02, 0.025, 0.03])
res = los + steps * 254
oracle = np.asarray(
    it._interp_uniform_tables(d0s, los, steps, fps_, 0.0, 255.0, res)
)
for name in VARIANTS:
    got = np.asarray(jax.jit(runner(name))(d0s, los, steps, fps_, res))
    print(f"max |{name} - f32 oracle|: {np.abs(got - oracle).max():.3e}",
          flush=True)

B, N = 4, 1080 * 1920
d0b = jnp.asarray(rng.uniform(-3, 3, size=(B, 3, N)).astype(np.float32))
lob = jnp.tile(los, (B, 1))
stepb = jnp.tile(steps, (B, 1))
fpb = jnp.tile(fps_, (B, 1, 1))
reb = jnp.tile(res, (B, 1))
for name in VARIANTS:
    f = jax.jit(jax.vmap(runner(name)))
    out = f(d0b, lob, stepb, fpb, reb)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    x = d0b
    for _ in range(10):
        out = f(x, lob, stepb, fpb, reb)
        x = d0b + 1e-12 * out.ravel()[0]
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / 10
    print(f"vmapped apply [{name}]: {dt * 1e3:.2f} ms/call (batch {B})",
          flush=True)

# full-method check for the two leading exact-enough candidates
for name in ("split3rp_b", "split2rp_b", "split3rp"):
    it._apply_tables_pallas = (
        lambda d0, grid_lo, step, fp, right_edge, v=name: runner(v)(
            d0, grid_lo, step, fp, right_edge
        )
    )
    it.iterative_distribution_transfer.clear_cache()
    fn = jax.jit(jax.vmap(it.iterative_distribution_transfer.__wrapped__))
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    target = jax.random.uniform(k1, (4, 1080, 1920, 3), dtype=jnp.float32)
    reference = jnp.clip(
        target * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, target.shape), 0, 1
    )
    out = fn(target, reference)
    float(out.mean())
    acc = target
    t0 = time.perf_counter()
    for _ in range(5):
        acc = fn(acc, reference)
    assert np.isfinite(float(acc.mean()))
    dt = (time.perf_counter() - t0) / 5
    print(f"full idt [{name}]: {4 / dt:.1f} fps ({dt * 1e3:.1f} ms/batch4)",
          flush=True)
