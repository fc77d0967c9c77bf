"""Multi-chip serving honesty measurement (VERDICT r3 #4).

Only one real chip is attached, so true 8-chip scaling cannot be timed —
what CAN be measured honestly on hardware is the per-chip cost of going
through the SHARDED serving path (methods/video.py: mesh + shard_batch
device_puts + host chunk loop) versus the plain jitted path on the same
chip. That bounds the dispatch overhead the sharded path adds; the v5e-8
projection is then per-chip fps x 8 x measured efficiency, valid because
frames are independent (no cross-chip collectives in serving — the only
coupling is the host input loop).

Writes the numbers for PERF.md's "Multi-chip serving" section.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from color_transfer_tpu import methods
from color_transfer_tpu.methods.video import color_transfer_between_videos

print("backend:", jax.default_backend(), "devices:", jax.devices(), flush=True)

H, W = 1080, 1920


def make_clip(t_frames):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    t = jax.random.uniform(k1, (t_frames, H, W, 3), dtype=jnp.float32)
    r = jnp.clip(t * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, t.shape), 0, 1)
    return np.asarray(t), np.asarray(r)  # numpy: the serving path's real input


def bench_video_api(name, t, r, iters=4, batch_size=8):
    out = color_transfer_between_videos(t, r, method=name, batch_size=batch_size)
    float(out.mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = color_transfer_between_videos(
            t, r, method=name, batch_size=batch_size
        )
        float(out.mean())  # host read each call: the API returns to the host
    dt = (time.perf_counter() - t0) / iters
    return t.shape[0] / dt


def bench_plain(name, t, r, iters=4, batch_size=8):
    fn = methods.get_method(name)
    mapped = jax.jit(jax.vmap(lambda a, b: jnp.clip(fn(a, b), 0.0, 1.0)))
    td, rd = jnp.asarray(t), jnp.asarray(r)
    outs = [
        mapped(td[s : s + batch_size], rd[s : s + batch_size])
        for s in range(0, t.shape[0], batch_size)
    ]
    float(outs[-1].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = [
            mapped(td[s : s + batch_size], rd[s : s + batch_size])
            for s in range(0, t.shape[0], batch_size)
        ]
        for o in outs:
            float(o.mean())
    dt = (time.perf_counter() - t0) / iters
    return t.shape[0] / dt


t32, r32 = make_clip(32)
for name, bs in (("monge_kantorovitch", 8), ("reinhard", 8), ("idt", 4)):
    fps_api = bench_video_api(name, t32, r32, batch_size=bs)
    fps_plain = bench_plain(name, t32, r32, batch_size=bs)
    eff = fps_api / fps_plain
    print(
        f"{name}: sharded-path {fps_api:.1f} fps | plain {fps_plain:.1f} fps"
        f" | dispatch efficiency {eff:.3f}",
        flush=True,
    )

# Deep serving: small clip (full-res deep fps is ~1.5-3/chip).
from color_transfer_tpu.run.modules import build_module

t4, r4 = make_clip(4)
for name in ("dmsct", "dcmcs3di"):
    module = build_module(name, {"heavy_metrics": False})
    sample = {
        "target": jnp.asarray(t4[:1]),
        "reference": jnp.asarray(r4[:1]),
    }
    variables = module.init_eval_variables(jax.random.PRNGKey(0), sample)

    out = color_transfer_between_videos(
        t4, r4, method=name, batch_size=1, module=module, variables=variables
    )
    float(out.mean())
    t0 = time.perf_counter()
    for _ in range(2):
        out = color_transfer_between_videos(
            t4, r4, method=name, batch_size=1, module=module,
            variables=variables,
        )
        float(out.mean())
    fps_api = 4 / ((time.perf_counter() - t0) / 2)

    batch = {"target": jnp.asarray(t4[:1]), "reference": jnp.asarray(r4[:1])}
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
