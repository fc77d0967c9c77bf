"""Verify no-split apply kernel exactness on TPU, then IDT/grading timing."""
import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax import lax
import color_transfer_tpu.methods.iterative as it
print("backend:", jax.default_backend(), flush=True)

# exactness: f32 tables with full-mantissa values through the compiled kernel
rng = np.random.default_rng(0)
d0 = jnp.asarray(rng.uniform(-3, 3, size=(3, 200000)).astype(np.float32))
fp = jnp.asarray((rng.uniform(0, 255, size=(3, 255)) + 1/3).astype(np.float32))
lo = jnp.asarray(np.full(3, -3.001, np.float32)); step = jnp.asarray(np.full(3, 6.01/255, np.float32))
re_ = jnp.asarray(np.full(3, 3.001, np.float32))
f_pal = jax.jit(lambda x: it._apply_tables_pallas(x, grid_lo=lo, step=step, fp=fp, right_edge=re_))
f_ref = jax.jit(lambda x: it._interp_uniform_tables(x, grid_lo=lo, step=step, fp=fp, left=0.0, right=255.0, right_edge=re_))
got, want = np.asarray(f_pal(d0)), np.asarray(f_ref(d0))
print("apply maxerr vs xla-path:", float(np.max(np.abs(got - want))), flush=True)

B, H, W = 4, 1080, 1920
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (B, H, W, 3), dtype=jnp.float32)
r = jnp.clip(t * 0.9 + 0.05, 0, 1)
def chain_ms(fn, iters=8):
    f = jax.jit(jax.vmap(fn))
    acc = f(t, r); float(acc.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters): acc = f(jnp.clip(acc, 0, 1), r)
    assert np.isfinite(float(acc.mean()))
    return (time.perf_counter() - t0) / iters * 1e3
ms = chain_ms(lambda a,b: it.iterative_distribution_transfer(a,b))
print(f"idt: {ms:.1f} ms/batch4 = {4000/ms:.1f} fps", flush=True)
ms = chain_ms(lambda a,b: it.automated_color_grading(a,b))
print(f"grading: {ms:.1f} ms/batch4 = {4000/ms:.1f} fps", flush=True)
