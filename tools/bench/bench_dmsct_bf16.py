import time, numpy as np, jax, jax.numpy as jnp
from color_transfer_tpu.models.dmsct import DMSCT
model = DMSCT(matcher_corr_dtype='bfloat16', matcher_compute_dtype='bfloat16')
t = jax.random.uniform(jax.random.PRNGKey(0), (1, 1080, 1920, 3))
r = jnp.clip(t * 0.95 + 0.01, 0, 1)
params = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, t[:, :64, :64], r[:, :64, :64])
fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
out = fwd(params, t, r); assert np.isfinite(float(out.mean()))
acc = t
t0 = time.perf_counter()
for _ in range(8): acc = fwd(params, acc, r)
assert np.isfinite(float(acc.mean()))
print(f"dmsct fullres bf16: {8.0/(time.perf_counter()-t0):.2f} fps", flush=True)
