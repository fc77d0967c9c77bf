import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

# --- 1. local correlation kernel, DMSCT training shape ---
from color_transfer_tpu.models.gmflow import local_correlation_with_flow
from color_transfer_tpu.ops.local_corr import local_correlation_with_flow_pallas

def bench_corr(fn, b, h, w, c, iters=10):
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    flow = jnp.asarray((rng.normal(size=(b, h, w, 2)) * 8).astype(np.float32))
    @jax.jit
    def step(flow):
        return flow + 1e-12 * jnp.mean(fn(f0, f1, flow))
    out = step(flow); float(jnp.mean(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out)
    float(jnp.mean(out))
    return (time.perf_counter() - t0) / iters

for name, b, h, w in [("train 24x64x120", 24, 64, 120), ("fullres 2x128x224", 2, 128, 224)]:
    for dt_name, dtype in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        tx = bench_corr(partial(local_correlation_with_flow, local_radius=4, corr_dtype=dtype, impl="xla"), b, h, w, 128)
        tp = bench_corr(partial(local_correlation_with_flow_pallas, local_radius=4, corr_dtype=dtype), b, h, w, 128)
        print(f"localcorr {name} {dt_name}: xla {tx*1e3:.2f} ms  pallas {tp*1e3:.2f} ms  ({tx/tp:.2f}x)", flush=True)

# --- 2. grading (regrain stencil) ---
from color_transfer_tpu import methods
def bench_classical(name, batch=4, iters=5):
    fn = methods.get_method(name)
    batched = jax.jit(jax.vmap(fn))
    key = jax.random.PRNGKey(0)
    t = jax.random.uniform(key, (batch, 1080, 1920, 3), dtype=jnp.float32)
    r = jnp.clip(t * 0.9 + 0.05, 0, 1)
    out = batched(t, r); float(out.mean())
    acc = t
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = batched(acc, r)
    assert np.isfinite(float(acc.mean()))
    return batch / ((time.perf_counter() - t0) / iters)

print(f"grading: {bench_classical('automated_color_grading'):.1f} fps", flush=True)
print(f"idt: {bench_classical('idt'):.1f} fps", flush=True)

# --- 3. DMSCT full-res inference: f32 default vs bf16 throughput config ---
from color_transfer_tpu.models.dmsct import DMSCT
def bench_dmsct(iters=4, **kw):
    model = DMSCT(**kw)
    t = jax.random.uniform(jax.random.PRNGKey(0), (1, 1080, 1920, 3))
    r = jnp.clip(t * 0.95 + 0.01, 0, 1)
    params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, t[:, :64, :64], r[:, :64, :64])
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    out = fwd(params, t, r); assert np.isfinite(float(out.mean()))
    acc = t
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, r)
    assert np.isfinite(float(acc.mean()))
    return 1.0 / ((time.perf_counter() - t0) / iters)

print(f"dmsct fullres f32: {bench_dmsct():.2f} fps", flush=True)
print(f"dmsct fullres bf16: {bench_dmsct(matcher_corr_dtype='bfloat16', matcher_compute_dtype='bfloat16'):.2f} fps", flush=True)
