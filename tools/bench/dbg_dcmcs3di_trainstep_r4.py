"""DCMCS3DI train-step timing under the recipe knobs (VERDICT r3 #5).

Reference config: batch 8 @ 160x320 crops (configs/dcmcs3di.yaml). Times
defaults (fused row-chunked matcher, f32), remat_convs, bf16 compute
recipe, and remat+bf16 — per-step host-blocking like training itself.
"""
import sys
import time

import jax
import jax.numpy as jnp

from color_transfer_tpu.run.modules import DCMCS3DIModule

print("backend:", jax.default_backend(), flush=True)

B, H, W = 8, 160, 320
batch = {
    "gt": jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3), dtype=jnp.float32),
    "reference": jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), dtype=jnp.float32),
}


def bench(tag, iters=6, **kw):
    mod = DCMCS3DIModule(heavy_metrics=False, **kw)
    state = mod.init_state(jax.random.PRNGKey(0), batch)
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
    print(
        f"{tag}: {min(times)*1e3:.0f} ms/step"
        f" (median {sorted(times)[len(times)//2]*1e3:.0f})",
        flush=True,
    )


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "f32"):
    bench("defaults f32")
if which in ("all", "remat"):
    bench("remat_convs", remat_convs=True)
if which in ("all", "bf16"):
    bench("bf16 compute", compute_dtype="bfloat16")
if which in ("all", "remat_bf16"):
    bench("remat + bf16", compute_dtype="bfloat16", remat_convs=True)
