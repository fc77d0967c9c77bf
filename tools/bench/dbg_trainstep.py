"""Measure DMSCT train step under dtype configs (per-step host blocking)."""
import sys
import time

import jax
import jax.numpy as jnp

from color_transfer_tpu.run.modules import DMSCTModule

print("backend:", jax.default_backend(), flush=True)

B, H, W = 12, 256, 480
batch = {
    "gt": jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), dtype=jnp.float32),
    "reference": jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), dtype=jnp.float32),
}


def bench(tag, iters=6, **kw):
    mod = DMSCTModule(heavy_metrics=False, **kw)
    state = mod.init_state(jax.random.PRNGKey(0), batch, num_train_steps=7665)
    key = jax.random.PRNGKey(3)
    state, logs = mod.train_step(state, dict(batch), key)
    float(logs["Training Total Loss"])
    state, logs = mod.train_step(state, dict(batch), key)  # warm
    float(logs["Training Total Loss"])
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, logs = mod.train_step(state, dict(batch), jax.random.fold_in(key, i))
        loss = float(logs["Training Total Loss"])
        times.append(time.perf_counter() - t0)
    assert loss == loss, "NaN loss"
    print(f"{tag}: {min(times)*1e3:.0f} ms/step (median {sorted(times)[len(times)//2]*1e3:.0f})", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "f32"):
    bench("defaults f32corr+pallas")
if which in ("all", "bf16corr"):
    bench("bf16 corr", matcher_corr_dtype="bfloat16")
if which in ("all", "bf16full"):
    bench("bf16 corr+compute (yaml recipe)", matcher_corr_dtype="bfloat16",
          matcher_compute_dtype="bfloat16")
