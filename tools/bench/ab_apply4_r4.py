"""Apply-kernel A/B, part 3 — full-method context only (isolated monolithic
timings invert and mislead; see ab_apply3_r4.py results). Candidates:

  split2   — r2 winner (74.6 fps), 4 DEFAULT dots/axis, ~1e-3 bin error.
  high     — ONE dot per select at Precision.HIGH (3-pass bf16): exact for
             one-hot selection (f32 == hi+mid+lo bf16 terms, 24 bits).
  high_w   — HIGH with fused [F|Fnext] (32,16) weights: 1 dot per AXIS.
  split2w  — 2-way split + fused weights: 2 dots per axis, ~1e-3 error.
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


def make_kernel(variant):
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
            Q = (lo[None] == hgrid).astype(jnp.float32)

            def dot(F, prec=None):
                return lax.dot_general(
                    F, Q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    **({"precision": prec} if prec else {}),
                )

            if variant == "split2":
                def sel(Fhi, Flo):
                    return jnp.sum(P * (dot(Fhi) + dot(Flo)), axis=0)

                v0 = sel(g_ref[a, 0], g_ref[a, 1])
                v1 = sel(g_ref[a, 2], g_ref[a, 3])
            elif variant == "high":
                def sel(F):
                    return jnp.sum(P * dot(F, lax.Precision.HIGH), axis=0)

                v0 = sel(g_ref[a, 0])
                v1 = sel(g_ref[a, 1])
            elif variant == "high_w":
                s = dot(g_ref[a, 0], lax.Precision.HIGH)  # (32, mb, 128)
                v0 = jnp.sum(P * s[:16], axis=0)
                v1 = jnp.sum(P * s[16:], axis=0)
            else:  # split2w
                s = dot(g_ref[a, 0]) + dot(g_ref[a, 1])
                v0 = jnp.sum(P * s[:16], axis=0)
                v1 = jnp.sum(P * s[16:], axis=0)
            val = v0 * (1.0 - frac) + v1 * frac
            val = jnp.where(x < grid_lo, 0.0, val)
            val = jnp.where(x > right_edge, float(n), val)
            out_ref[a] = val

    return kern


def pack_tables(fp, variant):
    fp_next = jnp.concatenate([fp[:, 1:], fp[:, -1:]], axis=1)

    def grid16(t):
        return jnp.pad(t, ((0, 0), (0, 256 - fp.shape[1]))).reshape(3, 16, 16)

    def sp2(t):
        t = grid16(t)
        h = t.astype(jnp.bfloat16).astype(jnp.float32)
        return h, t - h

    if variant == "split2":
        a1, a2 = sp2(fp)
        b1, b2 = sp2(fp_next)
        return jnp.stack([a1, a2, b1, b2], axis=1)
    if variant == "high":
        return jnp.stack([grid16(fp), grid16(fp_next)], axis=1)
    if variant == "high_w":
        return jnp.concatenate(
            [grid16(fp), grid16(fp_next)], axis=1
        )[:, None]  # (3, 1, 32, 16)
    # split2w
    a1, a2 = sp2(fp)
    b1, b2 = sp2(fp_next)
    return jnp.stack(
        [jnp.concatenate([a1, b1], 1), jnp.concatenate([a2, b2], 1)], axis=1
    )  # (3, 2, 32, 16)


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


H, W, BATCH, ITERS = 1080, 1920, 4, 5
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
target = jax.random.uniform(k1, (BATCH, H, W, 3), dtype=jnp.float32)
reference = jnp.clip(
    target * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, target.shape), 0, 1
)

# exactness vs the f32 XLA oracle first (small shape, fast)
rng = np.random.default_rng(0)
d0s = jnp.asarray(rng.uniform(-3, 3, size=(3, 32 * 128 * 3)).astype(np.float32))
fps_ = jnp.asarray(
    np.sort(rng.normal(size=(3, 255)), axis=1).astype(np.float32) * 50
)
los = jnp.asarray([-3.0, -2.5, -3.5])
steps = jnp.asarray([0.02, 0.025, 0.03])
res = los + steps * 254
oracle = np.asarray(
    it._interp_uniform_tables(d0s, los, steps, fps_, 0.0, 255.0, res)
)
for name in ("split2", "high", "high_w", "split2w"):
    got = np.asarray(jax.jit(runner(name))(d0s, los, steps, fps_, res))
    print(f"max |{name} - f32 oracle|: {np.abs(got - oracle).max():.3e}",
          flush=True)

for name in ("split2", "high", "high_w", "split2w"):
    it._apply_tables_pallas = (
        lambda d0, grid_lo, step, fp, right_edge, v=name: runner(v)(
            d0, grid_lo, step, fp, right_edge
        )
    )
    it.iterative_distribution_transfer.clear_cache()
    fn = jax.jit(jax.vmap(it.iterative_distribution_transfer.__wrapped__))
    out = fn(target, reference)
    float(out.mean())
    acc = target
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = fn(acc, reference)
    assert np.isfinite(float(acc.mean()))
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"full idt [{name}]: {BATCH / dt:.1f} fps ({dt * 1e3:.1f} ms/batch4)",
        flush=True,
    )
