"""Standalone FeatureTransformer bench at the two matcher scale shapes.

Usage: python tools/bench/bench_transformer.py [train|fullres]

Shapes (DMSCT): train crop 256x480 -> scale0 (24, 32, 60, 128) splits=2,
scale1 (48, 64, 120, 128) splits=8.  Fullres matcher cap 512x896 ->
scale0 (2, 64, 112, 128), scale1 (4, 128, 224, 128).

A/Bs three layout/kernel variants x {f32, bf16}:
  naive   — per-layer split/merge window transforms (round-2 path)
  winmaj  — window-major token layout across the stack (round-3 default)
  fused   — winmaj + fused Pallas windowed attention (opt-in)
"""
import sys
import time

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.gmflow import FeatureTransformer, feature_add_position

print("backend:", jax.default_backend(), flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "train"
if which == "train":
    shapes = [((24, 32, 60, 128), 2), ((48, 64, 120, 128), 8)]
else:
    shapes = [((2, 64, 112, 128), 2), ((4, 128, 224, 128), 8)]

VARIANTS = {
    "naive": dict(window_major=False),
    "winmaj": dict(),
    "fused": dict(fused_attention=True),
}


def bench(shape, splits, variant, iters=8, dtype=None):
    b, h, w, c = shape
    model = FeatureTransformer(
        num_layers=6, d_model=c, dtype=dtype, **VARIANTS[variant]
    )
    f0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    f1 = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    params = jax.jit(model.init, static_argnums=3)(
        jax.random.PRNGKey(2), f0[:1], f1[:1], splits
    )

    @jax.jit
    def fwd(p, a, b_):
        a, b_ = feature_add_position(a, b_, splits, c)
        o0, o1 = model.apply(p, a, b_, splits)
        return o0

    out = fwd(params, f0, f1)
    float(out.mean())
    # warm the chained signature too: under dtype=bf16 the output dtype
    # differs from f0's, and feeding it back would otherwise recompile
    # INSIDE the timed loop (the round-3 "bf16 is 60x slower" artifact)
    acc = fwd(params, out, f1)
    float(acc.mean())
    start = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, f1)
    float(acc.mean())
    dt = (time.perf_counter() - start) / iters
    tag = f"{shape} splits={splits} {variant:7s} dtype={dtype}"
    print(f"{tag}: {dt*1e3:.1f} ms", flush=True)
    return dt


for shape, splits in shapes:
    for variant in VARIANTS:
        for dtype in (None, jnp.bfloat16):
            try:
                bench(shape, splits, variant, dtype=dtype)
            except Exception as e:  # noqa: BLE001
                print(f"{variant} dtype={dtype} failed: {e}", flush=True)
