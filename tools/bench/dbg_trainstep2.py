import time

import jax
import jax.numpy as jnp
import numpy as np

from color_transfer_tpu.run.modules import DMSCTModule

print("backend:", jax.default_backend(), flush=True)

B, H, W = 12, 256, 480
batch = {
    "gt": jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), dtype=jnp.float32),
    "reference": jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), dtype=jnp.float32),
}

mod = DMSCTModule(heavy_metrics=False)
state = mod.init_state(jax.random.PRNGKey(0), batch, num_train_steps=7665)
print("init done", flush=True)

key = jax.random.PRNGKey(3)
t0 = time.perf_counter()
state, logs = mod.train_step(state, dict(batch), key)
loss = float(logs["Training Total Loss"])
print(f"compile+1st: {time.perf_counter()-t0:.1f}s loss={loss:.4f}", flush=True)

for i in range(8):
    t0 = time.perf_counter()
    state, logs = mod.train_step(state, dict(batch), jax.random.fold_in(key, i))
    loss = float(logs["Training Total Loss"])
    print(f"step {i}: {(time.perf_counter()-t0)*1e3:.0f} ms loss={loss:.4f}", flush=True)
