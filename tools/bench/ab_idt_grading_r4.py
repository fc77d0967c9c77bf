"""Round-4 regression hunt: IDT 74.5->59.0 fps and grading 50.0->44.9
between the round-2 and round-3 driver benches (VERDICT.md r3 Weak #2).

A/Bs, at the exact bench shapes (batch 4, 1080p, 5 iters chained):
  1. IDT with the Pallas apply kernel (current) vs the XLA interp path
     (the round-2 configuration used XLA apply until commit 8d69313's
     predecessor landed — this isolates whether the apply path regressed
     the whole method).
  2. Grading with the Pallas regrain stencil routed (current) vs pure XLA
     sweeps (round-2 configuration).

Usage: python tools/bench/ab_idt_grading_r4.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import color_transfer_tpu.methods.iterative as it
import color_transfer_tpu.ops.regrain_stencil as rs

H, W, BATCH, ITERS = 1080, 1920, 4, 5

print("backend:", jax.default_backend(), flush=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
target = jax.random.uniform(k1, (BATCH, H, W, 3), dtype=jnp.float32)
reference = jnp.clip(
    target * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, target.shape), 0, 1
)


def timeit(fn, tag):
    out = fn(target, reference)
    float(out.mean())  # compile + warm
    acc = target
    start = time.perf_counter()
    for _ in range(ITERS):
        acc = fn(acc, reference)
    assert np.isfinite(float(acc.mean()))
    dt = (time.perf_counter() - start) / ITERS
    print(f"{tag}: {BATCH / dt:.1f} fps  ({dt * 1e3 / BATCH:.1f} ms/frame)",
          flush=True)
    return BATCH / dt


orig_apply = it._apply_tables_pallas
orig_fits = rs.level_fits_vmem


def xla_apply(d0, grid_lo, step, fp, right_edge):
    return it._interp_uniform_tables(
        d0, grid_lo, step, fp, 0.0, float(fp.shape[1]), right_edge
    )


def fresh(fn):
    # The public entry points are module-level jax.jit closures over the
    # monkeypatched internals: rebuild the jit wrapper AND clear the inner
    # jit caches (grading calls the jitted idt internally — a cached inner
    # jaxpr would keep the pre-patch apply path).
    it.iterative_distribution_transfer.clear_cache()
    it.automated_color_grading.clear_cache()
    return jax.jit(jax.vmap(fn.__wrapped__))


# --- IDT ---
timeit(fresh(it.iterative_distribution_transfer), "idt pallas-apply (current)")
it._apply_tables_pallas = xla_apply
timeit(fresh(it.iterative_distribution_transfer), "idt xla-apply (r2 config)")
it._apply_tables_pallas = orig_apply

# --- grading ---
timeit(fresh(it.automated_color_grading), "grading stencil (current)")
rs.level_fits_vmem = lambda h, w, budget_bytes=0: False
timeit(fresh(it.automated_color_grading), "grading xla-sweeps (r2 config)")
rs.level_fits_vmem = orig_fits

# --- both off (full r2 configuration) ---
it._apply_tables_pallas = xla_apply
rs.level_fits_vmem = lambda h, w, budget_bytes=0: False
timeit(fresh(it.iterative_distribution_transfer), "idt xla-apply (repeat)")
timeit(fresh(it.automated_color_grading), "grading xla both-off")
it._apply_tables_pallas = orig_apply
rs.level_fits_vmem = orig_fits
