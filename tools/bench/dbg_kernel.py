import numpy as np, jax, jax.numpy as jnp
from color_transfer_tpu.ops.local_corr import local_correlation_with_flow_pallas
print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
b, h, w, c = 2, 64, 120, 128
f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
flow = jnp.asarray((rng.normal(size=(b, h, w, 2)) * 8).astype(np.float32))
out = local_correlation_with_flow_pallas(f0, f1, flow, 4, corr_dtype=jnp.bfloat16)
print("ok", out.shape, float(jnp.mean(out)))
