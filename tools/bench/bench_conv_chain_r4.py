"""Bench the fused ResB conv-chain kernel vs the XLA stack at the
DCMCS3DI extraction shape (2 views, 1080p, 64ch, 18 blocks).

Roofline context (PERF.md round 4): XLA extraction = 601 ms f32 / 517 ms
bf16; chip in-chain conv rate would be ~274 ms; bf16 MXU bound (50% util
at C=64) ~92 ms + halo overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp

from color_transfer_tpu.ops.conv_chain import resb_chain

print("backend:", jax.default_backend(), flush=True)

B, H, W, C, L = 2, 1080, 1920, 64, 18

key = jax.random.PRNGKey(0)
kx, kk, kb = jax.random.split(key, 3)
x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
kern = jax.random.normal(kk, (L, 2, 3, 3, C, C), jnp.float32) * 0.05
bias = jax.random.normal(kb, (L, 2, C), jnp.float32) * 0.1


def timeit(f, iters=5):
    # Chain iterations through a data dependency; sync via host read
    # (block_until_ready is a no-op under axon).
    def step(x0):
        out = f(x0)
        return x0 + (1e-12 * out.ravel()[0]).astype(x0.dtype)

    step = jax.jit(step)
    sync = jax.jit(lambda v: v.ravel()[0])
    y = step(x)
    float(sync(y))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = step(y)
    float(sync(y))
    return (time.perf_counter() - t0) / iters * 1e3


def xla_stack(x0, dtype):
    xx = x0.astype(dtype)
    kd = kern.astype(dtype)
    for l in range(L):
        y = jax.lax.conv_general_dilated(
            xx, kd[l, 0], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias[l, 0].astype(dtype)
        y = jnp.where(y >= 0, y, 0.01 * y)
        y = jax.lax.conv_general_dilated(
            y, kd[l, 1], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias[l, 1].astype(dtype)
        xx = xx + y
    return xx.astype(jnp.float32)


configs = sys.argv[1:] or [
    "xla_f32", "xla_bf16",
    "pallas_bf16_g3_r64", "pallas_bf16_g3_r96", "pallas_bf16_g2_r64",
    "pallas_bf16_g6_r64", "pallas_bf16_g1_r64", "pallas_f32_g3_r64",
    "pallas_bf16_g3_r128", "pallas_bf16_g9_r96",
]
for cfg in configs:
    try:
        if cfg == "xla_f32":
            ms = timeit(lambda v: xla_stack(v, jnp.float32))
        elif cfg == "xla_bf16":
            ms = timeit(lambda v: xla_stack(v, jnp.bfloat16))
        else:
            _, dt, g, r = cfg.split("_")
            dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
            g, r = int(g[1:]), int(r[1:])
            ms = timeit(
                lambda v, g=g, r=r, dtype=dtype: resb_chain(
                    v, kern, bias, group=g, rows=r, compute_dtype=dtype
                )
            )
        print(f"{cfg}: {ms:.1f} ms ({ms / (2 * L):.2f} ms/conv)", flush=True)
    except Exception as e:  # noqa: BLE001 — print and continue the sweep
        print(f"{cfg}: FAILED {type(e).__name__}: {e}", flush=True)
