"""Matcher forward ablation + profile at DMSCT train shape."""
import sys
import time

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.gmflow import GMFlow

print("backend:", jax.default_backend(), flush=True)

B, H, W = 12, 256, 480
t = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3)) * 255.0
r = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3)) * 255.0


def bench(layers, refine, tag, iters=5, profile=False):
    m = GMFlow(num_transformer_layers=layers, num_reg_refine=refine,
               inference_size=(H, W))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), t[:1, :64, :64], r[:1, :64, :64])

    @jax.jit
    def fwd(v, a, b):
        return m.apply(v, a, b, pred_bidir_flow=True,
                       fwd_bwd_consistency_check=True)

    out = fwd(v, t, r)
    float(out["flow"].mean())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fwd(v, t, r)
        float(out["flow"].mean())
        times.append(time.perf_counter() - t0)
    print(f"{tag}: {min(times)*1e3:.0f} ms", flush=True)
    if profile:
        with jax.profiler.trace("/tmp/jaxprof_matcher"):
            out = fwd(v, t, r)
            float(out["flow"].mean())


which = sys.argv[1] if len(sys.argv) > 1 else "ablate"
if which == "ablate":
    bench(6, 6, "full (6L,6R)")
    bench(6, 1, "6L,1R")
    bench(1, 6, "1L,6R")
    bench(1, 1, "1L,1R")
    bench(1, 0, "1L,0R") if False else None
elif which == "profile":
    bench(6, 6, "full (profiled)", profile=True)
