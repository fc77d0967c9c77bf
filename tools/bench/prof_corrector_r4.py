"""DMSCT corrector floor split @1080p bf16 (roofline r4 follow-up).

The round-4 roofline attributes 191 ms bf16 to "corrector + CNN encoder +
correlations". Split the trainable-corrector part: efficientnet-b2
encoder x2 views, per-level warps, UNet decoder + head — each timed with
the chained-dependency harness (output feeds next input) so the tunnel
cannot pipeline across iterations.
"""
import os
import time

import jax
import jax.numpy as jnp

from color_transfer_tpu.models.efficientnet import EfficientNetEncoder
from color_transfer_tpu.models.unet_decoder import SegmentationHead, UnetDecoder
from color_transfer_tpu.core.sampling import flow_warp_batched

print("backend:", jax.default_backend(), flush=True)

# x16-padded 1080p by default; override for CPU smoke tests.
H = int(os.environ.get("PROF_H", "1088"))
W = int(os.environ.get("PROF_W", "1920"))
DT = jnp.bfloat16
key = jax.random.PRNGKey(0)


def chain_ms(f, *args, iters=6):
    out = f(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    x = args[0]
    for _ in range(iters):
        out = f(x, *args[1:])
        lead = jnp.asarray(jax.tree_util.tree_leaves(out)[0])
        x = x + (1e-12 * lead.ravel()[0]).astype(x.dtype)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


# --- encoder ---
enc = EfficientNetEncoder(name_variant="efficientnet-b2", depth=4, dtype=DT)
x = jax.random.uniform(key, (1, H, W, 3), jnp.float32)
ev = jax.jit(lambda k: enc.init(k, x[:, :64, :64]))(key)
enc_fwd = jax.jit(lambda v, a: enc.apply(v, a))
ms = chain_ms(lambda a: enc_fwd(ev, a), x)
print(f"encoder b2 @{H}x{W} (1 view): {ms:.1f} ms", flush=True)

feats = jax.eval_shape(lambda a: enc_fwd(ev, a), x)
chans = tuple(int(f.shape[-1]) for f in feats)
print("feature channels:", chans, flush=True)

# --- warps (4 levels, reductions 2..16) ---
feat_vals = [
    jax.random.uniform(key, (1, H >> i, W >> i, c), jnp.float32)
    for i, c in enumerate(chans)
]
flows = [
    jax.random.uniform(key, (1, H >> i, W >> i, 2), jnp.float32) * 4.0
    for i in range(len(chans))
]


def warps(f0, *rest):
    outs = [flow_warp_batched(f, fl) for f, fl in zip((f0, *rest), flows[1:])]
    return outs[-1]


warp_fwd = jax.jit(warps)
ms = chain_ms(warp_fwd, *feat_vals[1:])
print(f"flow warps (4 levels): {ms:.1f} ms", flush=True)

# --- decoder + head on the real (2C+1) pyramid ---
dec = UnetDecoder((256, 128, 64, 32), dtype=DT)
head = SegmentationHead(3, dtype=DT)
pyr = [
    jax.random.uniform(key, (1, H >> i, W >> i, 2 * c + 1), jnp.float32)
    for i, c in enumerate(chans)
]
tiny = [
    jnp.zeros((1, 64 >> i, 64 >> i, 2 * c + 1), jnp.float32)
    for i, c in enumerate(chans)
]
dv = jax.jit(lambda k: dec.init(k, *tiny))(key)
hv = jax.jit(
    lambda k: head.init(k, jnp.zeros((1, 64, 64, 32), jnp.float32))
)(key)
dec_fwd = jax.jit(lambda p0, *rest: head.apply(hv, dec.apply(dv, p0, *rest)))
ms = chain_ms(dec_fwd, *pyr)
print(f"decoder+head @{H}x{W}: {ms:.1f} ms", flush=True)

# --- resolution scaling probe (depthwise = VPU, scales linearly;
# MXU convs scale better than linear at small sizes) ---
xh = x[:, : H // 2, : W // 2]
ms = chain_ms(lambda a: enc_fwd(ev, a), xh)
print(f"encoder b2 @{H//2}x{W//2} (1 view): {ms:.1f} ms", flush=True)
