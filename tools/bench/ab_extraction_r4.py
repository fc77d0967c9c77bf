"""Why do DCMCS3DI extraction convs run 2.3x slower than the chip's own
in-chain conv rate? (Roofline r4: ResB 33.4 ms/block f32 at batch 2 =
16.7 ms/conv, vs 3.69 ms/conv measured for a plain 10-conv chain at
batch 1.) Isolate the structural suspects, all at (2, 1080, 1920, 64)
volume, chained with scalar syncs:

  chain     — plain 18x2-conv chain, batch 2 (the rate extraction should hit)
  resb      — 18 true ResB blocks (conv-leaky-conv-add), batch 2
  resb_b1x2 — 18 ResB at batch 1, called on each view inside one jit
  resb_nchw — 18 ResB with NCHW layout
  resb_bf16 — 18 ResB batch 2, bf16
  chain_bf16— plain chain, bf16
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

H, W, C = 1080, 1920, 64
N_BLOCKS = 18


def chain_ms(f, *args, iters=5):
    def step(x, *rest):
        out = f(x, *rest)
        lead = jax.tree_util.tree_leaves(out)[0]
        return x + (1e-12 * lead.ravel()[0]).astype(x.dtype)

    step = jax.jit(step)
    sync = jax.jit(lambda x: jnp.ravel(x)[0])
    x = step(*args)
    float(sync(x))
    t0 = time.perf_counter()
    x = args[0]
    for _ in range(iters):
        x = step(x, *args[1:])
    float(sync(x))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, k, nums=("NHWC", "HWIO", "NHWC")):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=nums
    )


def run(tag, f, x, k, per_conv):
    ms = chain_ms(f, x, k)
    print(f"{tag}: {ms:.1f} ms total = {ms / per_conv:.2f} ms/conv",
          flush=True)


k32 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.float32) * 0.05
x2 = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, C), jnp.float32)

run("chain f32 b2 (36 convs)",
    lambda x, k: [x := conv(x, k) for _ in range(2 * N_BLOCKS)][-1],
    x2, k32, 2 * N_BLOCKS)


def resb_stack(x, k, blocks=N_BLOCKS, nums=("NHWC", "HWIO", "NHWC")):
    for _ in range(blocks):
        y = conv(x, k, nums)
        y = jax.nn.leaky_relu(y, 0.1)
        y = conv(y, k, nums)
        x = x + y
    return x


run("resb f32 b2 (18 blocks)", lambda x, k: resb_stack(x, k), x2, k32,
    2 * N_BLOCKS)

x1 = x2[:1]
run(
    "resb f32 b1x2-views (18 blocks each)",
    lambda x, k: resb_stack(x, k) + resb_stack(x * 0.5, k),
    x1, k32, 4 * N_BLOCKS,
)

xn = jnp.moveaxis(x2, -1, 1)  # NCHW
kn = k32  # HWIO stays
run(
    "resb f32 b2 NCHW (18 blocks)",
    lambda x, k: resb_stack(x, k, nums=("NCHW", "HWIO", "NCHW")),
    xn, kn, 2 * N_BLOCKS,
)

x2b = x2.astype(jnp.bfloat16)
kb = k32.astype(jnp.bfloat16)
run("chain bf16 b2 (36 convs)",
    lambda x, k: [x := conv(x, k) for _ in range(2 * N_BLOCKS)][-1],
    x2b, kb, 2 * N_BLOCKS)
run("resb bf16 b2 (18 blocks)", lambda x, k: resb_stack(x, k), x2b, kb,
    2 * N_BLOCKS)
