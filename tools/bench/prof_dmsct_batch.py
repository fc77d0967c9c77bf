"""DMSCT fullres throughput vs batch (the serving lever)."""
import time, numpy as np, jax, jax.numpy as jnp
from color_transfer_tpu.models.dmsct import DMSCT
print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
model = DMSCT(matcher_corr_dtype='bfloat16', matcher_compute_dtype='bfloat16')
t1 = jax.random.uniform(key, (1, 1080, 1920, 3))
params = model.init({"params": key, "dropout": jax.random.PRNGKey(1)}, t1[:, :64, :64], t1[:, :64, :64])
fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
for B in (2, 4):
    t = jax.random.uniform(key, (B, 1080, 1920, 3))
    r = jnp.clip(t * 0.95 + 0.01, 0, 1)
    out = fwd(params, t, r); assert np.isfinite(float(out.mean()))
    acc = t
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters): acc = fwd(params, acc, r)
    assert np.isfinite(float(acc.mean()))
    fps = B / ((time.perf_counter() - t0) / iters)
    print(f"dmsct fullres bf16 batch{B}: {fps:.2f} fps/chip", flush=True)
