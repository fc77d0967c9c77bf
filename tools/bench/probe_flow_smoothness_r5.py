"""Probe: is real matcher flow tile-locally smooth enough for a
common-window warp kernel? (round 5)

The DMSCT warp stage is descriptor-bound (PERF.md round-5: 60 ms, 45 of
it the full-res L0 warp — one XLA gather descriptor per pixel). A Pallas
kernel that loads ONE (8+vspread, 128+hspread) window per (8,128) output
tile and selects per-pixel corners by masked lane-rolls needs the
per-tile spread of floor(flow) to be small, with rare outliers repaired
by a sparse fallback. This measures those statistics on flow from the
REAL matcher (random init + the synthetic gate stereopair upscaled, and
a pure random-noise pair as the adversarial case) at 1080p.
"""
import numpy as np
import jax
import jax.numpy as jnp

from color_transfer_tpu.core.resize import derive_matcher_size
from color_transfer_tpu.models.gmflow import GMFlow

print("backend:", jax.default_backend(), flush=True)

H, W = 1080, 1920
key = jax.random.PRNGKey(0)

# Synthetic stereopair in the gate's style (structured plate + shift).
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
base = np.stack(
    [
        0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 29.0),
        0.5 + 0.3 * np.cos(xx / 23.0 + yy / 41.0),
        0.5 + 0.35 * np.sin((xx + yy) / 53.0),
    ],
    axis=-1,
)
rng = np.random.default_rng(3)
base = np.clip(base + 0.05 * rng.standard_normal(base.shape), 0, 1)
pairs = {
    "structured": (
        jnp.asarray(base)[None],
        jnp.asarray(np.roll(base, 24, axis=1))[None],
    ),
    "noise": (
        jax.random.uniform(key, (1, H, W, 3)),
        jax.random.uniform(jax.random.PRNGKey(9), (1, H, W, 3)),
    ),
}

model = GMFlow()
t0 = pairs["structured"][0]
params = jax.jit(model.init)(key, t0[:, :64, :64] * 255, t0[:, :64, :64] * 255)
size = derive_matcher_size(H, W)
fwd = jax.jit(
    lambda p, a, b: model.apply(
        p, a * 255.0, b * 255.0, pred_bidir_flow=True,
        fwd_bwd_consistency_check=False, inference_size=size,
    )["flow"]
)

for tag, (a, b) in pairs.items():
    flow = np.asarray(fwd(params, a, b))[0]  # (H, W, 2)
    fx = np.floor(flow[..., 0]).astype(np.int64)
    fy = np.floor(flow[..., 1]).astype(np.int64)
    th, tw = H // 8, W // 128
    for name, f in (("h(u)", fx), ("v(v)", fy)):
        tiles = f[: th * 8, : tw * 128].reshape(th, 8, tw, 128)
        spread = tiles.max(axis=(1, 3)) - tiles.min(axis=(1, 3))
        qs = np.percentile(spread, [50, 90, 99, 99.9])
        print(
            f"{tag} {name}: tile spread p50={qs[0]:.0f} p90={qs[1]:.0f} "
            f"p99={qs[2]:.0f} p99.9={qs[3]:.0f} max={spread.max()} | "
            f"frac(spread<=8)={np.mean(spread <= 8):.4f} "
            f"frac(<=16)={np.mean(spread <= 16):.4f} "
            f"frac(<=32)={np.mean(spread <= 32):.4f}",
            flush=True,
        )
    print(
        f"{tag}: |u| max={np.abs(flow[..., 0]).max():.1f} "
        f"|v| max={np.abs(flow[..., 1]).max():.1f}",
        flush=True,
    )
