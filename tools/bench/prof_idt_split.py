"""IDT per-component ablation at 1080p batch4 on TPU."""
import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
import color_transfer_tpu.methods.iterative as it
from jax import lax
print("backend:", jax.default_backend(), flush=True)
B, H, W = 4, 1080, 1920
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (B, H, W, 3), dtype=jnp.float32)
r = jnp.clip(t * 0.9 + 0.05, 0, 1)

def chain_ms(make_fn, iters=8):
    f = jax.jit(jax.vmap(make_fn))
    acc = f(t, r); float(acc.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters): acc = f(jnp.clip(acc, 0, 1), r)
    assert np.isfinite(float(acc.mean()))
    return (time.perf_counter() - t0) / iters * 1e3

mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)

def idt_ablate(skip):
    def fn(target, reference):
        shape = target.shape
        tt = target.reshape(-1, 3); rr = reference.reshape(-1, 3)
        rotations = it.random_rotations(jax.random.PRNGKey(42), 4)
        def body(t_cur, rot):
            d0r = mm(rot, t_cur.T); d1r = mm(rot, rr.T)
            if skip == "all_after_proj":
                return t_cur + 1e-9*d0r.T + 1e-9*d1r.T, None
            lo = jnp.minimum(d0r.min(axis=1), d1r.min(axis=1))
            hi = jnp.maximum(d0r.max(axis=1), d1r.max(axis=1))
            step = (hi - lo) / 255
            if skip == "after_minmax":
                return t_cur + 1e-9*(lo+hi+step)[None, :], None
            def cdf(d):
                scaled = (d - lo[:, None]) / (hi - lo)[:, None] * 255
                counts = it._uniform_histograms(scaled, 255)
                cp = jnp.cumsum(counts, axis=1)
                return cp / cp[:, -1:]
            cp0, cp1 = cdf(d0r), cdf(d1r)
            if skip == "after_hist":
                return t_cur + 1e-9*(cp0.sum()+cp1.sum()), None
            edges_tail = lo[:, None] + step[:, None] * jnp.arange(1, 256)
            f = jax.vmap(it._interp_small)(cp0, cp1, edges_tail)
            d_r = it._apply_tables_pallas(d0r, grid_lo=lo+step, step=step, fp=f, right_edge=hi)
            if skip == "after_apply":
                return t_cur + 1e-9*d_r.T, None
            t_next = mm(rot.T, d_r - d0r).T + t_cur
            return t_next, None
        out, _ = lax.scan(body, tt, rotations)
        return out.reshape(shape)
    return fn

for skip in ("all_after_proj", "after_minmax", "after_hist", "after_apply", "none"):
    print(f"idt[{skip}]: {chain_ms(idt_ablate(skip)):.1f} ms/batch4", flush=True)
