"""Does the serving-shape conv gap exist at the TRAIN shape? (round 5)

The round-4 roofline showed XLA runs the 1080p batch-2 extraction ResB
stack at 13-17 ms/conv vs the chip's own 3.7 in-chain rate, and the fused
conv-chain kernel (ops/conv_chain.py) recovers it — for INFERENCE. VERDICT
r4 #4 asks to route the kernel into the train step. Whether that pays
depends on the XLA conv rate at the train shape (16, 160, 320, 64) — the
batch-2 schedule pathology (ab_extraction_r4.py) may not exist at batch 16.

Measures, at the extraction volume of the reference train config
(batch 8 crops x 2 views = 16 @ 160x320, configs/dcmcs3di.yaml:12-17):
  1. XLA ResB stack forward               (what a pallas fwd would replace)
  2. XLA ResB stack fwd+bwd (value_and_grad wrt params+input)
  3. pallas resb_chain forward            (the inference kernel as-is)
for f32 and bf16 compute.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from color_transfer_tpu.models.dcmcs3di import Extractor
from color_transfer_tpu.ops.conv_chain import resb_chain

print("backend:", jax.default_backend(), flush=True)

B, H, W, C, L = 16, 160, 320, 64, 18
x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3), dtype=jnp.float32)


def timeit_chained(fn, x0, lead, iters=8):
    """Chained timing per PERF.md methodology: each iteration's output
    perturbs the next input (data dependency), one host read at the end —
    unchained jit timings through the tunnel measure dispatch, not compute.
    ``lead(out)`` reduces fn's output to a scalar array."""
    out = fn(x0)
    assert np.isfinite(float(lead(out)))
    acc = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(acc)
        acc = acc + (1e-12 * lead(out)).astype(acc.dtype)
    assert np.isfinite(float(lead(out)))
    return (time.perf_counter() - t0) / iters * 1e3


for dtype_name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
    model = Extractor(C, L, dtype=cd)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x)

    fwd = jax.jit(lambda p, v: model.apply(p, v))
    ms_fwd = timeit_chained(
        lambda v: fwd(params, v), x, lambda o: o.ravel()[0]
    )

    def loss(p, v):
        return jnp.mean(model.apply(p, v) ** 2)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    ms_vg = timeit_chained(
        lambda v: vg(params, v), x, lambda o: o[0]
    )

    # pallas inference kernel on the same weights
    p = params["params"]
    kernels = jnp.stack([
        jnp.stack([p[f"ResB_{i}"][f"Conv_{j}"]["Conv_0"]["kernel"]
                   for j in (0, 1)]) for i in range(L)
    ])
    biases = jnp.stack([
        jnp.stack([p[f"ResB_{i}"][f"Conv_{j}"]["Conv_0"]["bias"]
                   for j in (0, 1)]) for i in range(L)
    ])
    stem = p["Conv_0"]["Conv_0"]
    y0 = jax.lax.conv_general_dilated(
        x, stem["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + stem["bias"]
    pal = jax.jit(functools.partial(
        resb_chain, group=3, rows=128,
        compute_dtype=(cd or jnp.float32),
    ))
    ms_pal = timeit_chained(
        lambda v: pal(v, kernels, biases), y0, lambda o: o.ravel()[0]
    )

    n_convs = 2 * L
    print(
        f"{dtype_name}: xla fwd {ms_fwd:.1f} ms ({ms_fwd / n_convs:.2f}/conv)"
        f" | xla fwd+bwd {ms_vg:.1f} ms"
        f" | pallas fwd {ms_pal:.1f} ms ({ms_pal / n_convs:.2f}/conv)",
        flush=True,
    )
