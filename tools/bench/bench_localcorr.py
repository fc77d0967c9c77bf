import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from color_transfer_tpu.models.gmflow import local_correlation_with_flow
from color_transfer_tpu.ops.local_corr import local_correlation_with_flow_pallas

print("backend:", jax.default_backend())

def bench(fn, f0, f1, flow, iters=10):
    # data-chain: feed a scalar derived from the output back into the flow
    @jax.jit
    def step(flow):
        corr = fn(f0, f1, flow)
        return flow + 1e-12 * jnp.mean(corr)

    out = step(flow)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out)
    float(jnp.mean(out))  # host read
    dt = (time.perf_counter() - t0) / iters
    return dt

rng = np.random.default_rng(0)
shapes = [
    ("train 24x64x120", 24, 64, 120),
    ("fullres 2x128x224", 2, 128, 224),
]
for name, b, h, w in shapes:
    c = 128
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    flow = jnp.asarray((rng.normal(size=(b, h, w, 2)) * 8).astype(np.float32))
    for dt_name, dtype in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        t_x = bench(partial(local_correlation_with_flow, local_radius=4, corr_dtype=dtype, impl="xla"), f0, f1, flow)
        t_v = bench(partial(local_correlation_with_flow_pallas, local_radius=4, corr_dtype=dtype, variant="vpu"), f0, f1, flow)
        t_m = bench(partial(local_correlation_with_flow_pallas, local_radius=4, corr_dtype=dtype, variant="mxu"), f0, f1, flow)
        print(f"{name} {dt_name}: xla {t_x*1e3:.2f} ms  vpu {t_v*1e3:.2f} ms  mxu {t_m*1e3:.2f} ms  (best {t_x/min(t_v,t_m):.2f}x)")
