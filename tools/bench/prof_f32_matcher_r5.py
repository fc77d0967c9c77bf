"""f32 (gated-config) DMSCT matcher internals @1080p by knob ablation.

The gated serving config is full f32 (PARITY_RESULTS.md round-5), so its
matcher cost structure is the remaining lever. Round-4 attributed
"GRU refinement 149 ms f32 vs 66 bf16", but the corr kernel delta
(f32-VPU 20.0 vs bf16-MXU 15.6 ms/iter) explains only ~26 ms of the 83 —
this script splits the f32 loop by marginal knob deltas inside the FULL
program (the only tunnel-trustworthy method, PERF.md):

  refine 6 -> 3 -> 1   : per-GRU-iteration marginal cost
  layers 6 -> 3        : per-transformer-layer marginal cost
  corr impl xla vs pallas (f32): the corr kernel's in-program value
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from color_transfer_tpu.models.dmsct import DMSCT

print("backend:", jax.default_backend(), flush=True)

H = int(os.environ.get("PROF_H", "1080"))
W = int(os.environ.get("PROF_W", "1920"))
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (1, H, W, 3))
r = jnp.clip(t * 0.95 + 0.01, 0, 1)


def ms(tag, iters=5, **kwargs):
    model = DMSCT(**kwargs)
    params = model.init(
        {"params": key, "dropout": jax.random.PRNGKey(1)},
        t[:, :64, :64],
        r[:, :64, :64],
    )
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    out = fwd(params, t, r)
    assert np.isfinite(float(out.mean()))
    acc = t
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, r)
    assert np.isfinite(float(acc.mean()))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {dt:.1f} ms", flush=True)
    return dt


full = ms("f32 full (refine=6, layers=6)")
r3 = ms("refine=3", matcher_num_reg_refine=3)
r1 = ms("refine=1", matcher_num_reg_refine=1)
l3 = ms("layers=3", matcher_num_layers=3)
print(
    f"attribution: per-GRU-iter {(full - r3) / 3:.1f} (6->3) / "
    f"{(r3 - r1) / 2:.1f} (3->1) | per-transformer-layer "
    f"{(full - l3) / 3:.1f} | non-refine non-transformer floor "
    f"{r1 - (full - r3) / 3 - 3 * (full - l3):.0f}-ish",
    flush=True,
)
