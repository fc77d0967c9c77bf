"""Multi-chip serving honesty measurement (VERDICT r3 #4).

Only one real chip is attached, so true 8-chip scaling cannot be timed —
what CAN be measured honestly on hardware is the per-chip cost of going
through the SHARDED serving path (methods/video.py: mesh + shard_batch +
host chunk loop) versus the plain jitted path on the same chip. That
bounds the dispatch overhead the sharded path adds; the v5e-8 projection
is then per-chip fps x 8 x measured efficiency, valid because frames are
independent (no cross-chip collectives in serving — the only coupling is
the host input loop).

Tunnel note: clips live ON DEVICE for both paths and each call syncs via
one scalar host read. Feeding numpy through the remote tunnel would
measure the tunnel's host link (~1.5 GB/call at single-digit MB/s), which
does not represent a real PCIe-attached host; on a real pod the host feed
is pipelined (double-buffered device_put) and is accounted separately.

Writes the numbers for PERF.md's "Multi-chip serving" section.
"""

import time

import jax
import jax.numpy as jnp

from color_transfer_tpu import methods
from color_transfer_tpu.methods.video import color_transfer_between_videos

print("backend:", jax.default_backend(), "devices:", jax.devices(), flush=True)

H, W = 1080, 1920


def make_clip(t_frames):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    t = jax.random.uniform(k1, (t_frames, H, W, 3), dtype=jnp.float32)
    r = jnp.clip(t * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, t.shape), 0, 1)
    return t, r  # device-resident


def bench_video_api(name, t, r, iters=3, batch_size=8):
    out = color_transfer_between_videos(t, r, method=name, batch_size=batch_size)
    float(out.mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = color_transfer_between_videos(
            t, r, method=name, batch_size=batch_size
        )
        float(out.mean())  # one scalar sync per call
    dt = (time.perf_counter() - t0) / iters
    return t.shape[0] / dt


def bench_plain(name, t, r, iters=3, batch_size=8):
    fn = methods.get_method(name)
    mapped = jax.jit(jax.vmap(lambda a, b: jnp.clip(fn(a, b), 0.0, 1.0)))
    outs = [
        mapped(t[s : s + batch_size], r[s : s + batch_size])
        for s in range(0, t.shape[0], batch_size)
    ]
    float(outs[-1].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = [
            mapped(t[s : s + batch_size], r[s : s + batch_size])
            for s in range(0, t.shape[0], batch_size)
        ]
        float(outs[-1].mean())
    dt = (time.perf_counter() - t0) / iters
    return t.shape[0] / dt


t16, r16 = make_clip(16)
for name, bs in (("monge_kantorovitch", 8), ("reinhard", 8), ("idt", 4)):
    fps_api = bench_video_api(name, t16, r16, batch_size=bs)
    fps_plain = bench_plain(name, t16, r16, batch_size=bs)
    eff = fps_api / fps_plain
    print(
        f"{name}: sharded-path {fps_api:.1f} fps | plain {fps_plain:.1f} fps"
        f" | dispatch efficiency {eff:.3f}",
        flush=True,
    )

# Deep serving: small clip (full-res deep fps is ~1.5-4/chip).
from color_transfer_tpu.run.modules import build_module

t2, r2 = make_clip(2)
for name in ("dmsct", "dcmcs3di"):
    module = build_module(name, {"heavy_metrics": False})
    sample = {"target": t2[:1], "reference": r2[:1]}
    variables = module.init_eval_variables(jax.random.PRNGKey(0), sample)

    out = color_transfer_between_videos(
        t2, r2, method=name, batch_size=1, module=module, variables=variables
    )
    float(out.mean())
    t0 = time.perf_counter()
    for _ in range(2):
        out = color_transfer_between_videos(
            t2, r2, method=name, batch_size=1, module=module,
            variables=variables,
        )
        float(out.mean())
    fps_api = 2 / ((time.perf_counter() - t0) / 2)

    batch = {"target": t2[:1], "reference": r2[:1]}
    out = module.eval_forward(variables, batch)
    float(out.mean())
    t0 = time.perf_counter()
    for _ in range(4):
        out = module.eval_forward(variables, batch)
        float(out.mean())
    fps_plain = 1 / ((time.perf_counter() - t0) / 4)
    print(
        f"{name}: sharded-path {fps_api:.2f} fps | plain {fps_plain:.2f} fps"
        f" | dispatch efficiency {fps_api / fps_plain:.3f}",
        flush=True,
    )
