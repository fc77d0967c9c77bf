"""Round-4 IDT regression hunt, part 2: the apply-path A/B cleared the
Pallas kernels (current routing beats the r2 routing under today's
toolchain), so the ~13 ms/batch4 regression lives in code shared by both
configs. Suspects: the int4 one-hot histograms (79b241e, landed round 3),
or toolchain drift. This A/Bs the histogram operand dtype and times the
IDT sub-phases at the bench shape (batch 4, 1080p).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import color_transfer_tpu.methods.iterative as it

H, W, BATCH, ITERS = 1080, 1920, 4, 5
print("backend:", jax.default_backend(), flush=True)

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
target = jax.random.uniform(k1, (BATCH, H, W, 3), dtype=jnp.float32)
reference = jnp.clip(
    target * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, target.shape), 0, 1
)


def timeit_full(fn, tag, iters=ITERS):
    out = fn(target, reference)
    float(out.mean())
    acc = target
    start = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc, reference)
    assert np.isfinite(float(acc.mean()))
    dt = (time.perf_counter() - start) / iters
    print(f"{tag}: {BATCH / dt:.1f} fps ({dt * 1e3:.1f} ms/batch{BATCH})",
          flush=True)


def fresh():
    it.iterative_distribution_transfer.clear_cache()
    return jax.jit(jax.vmap(it.iterative_distribution_transfer.__wrapped__))


orig_hist = it._uniform_histograms


def hist_bf16(scaled, bins):
    idx = jnp.clip(jnp.floor(scaled), 0, bins - 1).astype(jnp.int32)
    P, Q = it._onehot_pair(idx)
    counts = jnp.einsum("anh,anl->ahl", P, Q,
                        preferred_element_type=jnp.float32)
    return counts.reshape(scaled.shape[0], 16 * 16)[:, :bins]


timeit_full(fresh(), "idt int4-hist (current)")
it._uniform_histograms = hist_bf16
timeit_full(fresh(), "idt bf16-hist (pre-79b241e)")
it._uniform_histograms = orig_hist

# ---- sub-phase timings (chained within each phase) ----
N = H * W
t = target.reshape(BATCH, N, 3)
r = reference.reshape(BATCH, N, 3)
rot = it.random_rotations(jax.random.PRNGKey(42), 4)[0]  # one rotation


def chain_time(fn, x, tag, iters=8):
    x = fn(x)
    float(np.asarray(x).ravel()[0])
    start = time.perf_counter()
    acc = x
    for _ in range(iters):
        acc = fn(acc)
    float(np.asarray(acc).ravel()[0])
    dt = (time.perf_counter() - start) / iters
    print(f"  {tag}: {dt * 1e3:.1f} ms/batch{BATCH} (x4 rot = "
          f"{4 * dt * 1e3:.1f})", flush=True)


mm = jax.jit(
    jax.vmap(lambda x: jnp.matmul(rot, x.T, precision=lax.Precision.HIGHEST))
)
chain_time(lambda d: mm(d.swapaxes(1, 2)).swapaxes(1, 2), t.swapaxes(1, 2),
           "projection matmul (one rot, fwd)")


def hist_phase(d):  # (B, 3, N) -> counts
    def one(dd):
        lo = dd.min(axis=1)
        hi = dd.max(axis=1)
        scaled = (dd - lo[:, None]) / (hi - lo)[:, None] * 255
        return it._uniform_histograms(scaled, 255)

    return jax.vmap(one)(d)


hp = jax.jit(hist_phase)
d3 = t.swapaxes(1, 2)  # (B, 3, N)
out = hp(d3)
float(np.asarray(out).ravel()[0])
start = time.perf_counter()
for _ in range(8):
    out = hp(d3 + out.mean() * 0)  # cheap data dependency
float(np.asarray(out).ravel()[0])
print(f"  histogram phase (one rot, int4): "
      f"{(time.perf_counter() - start) / 8 * 1e3:.1f} ms/batch{BATCH}",
      flush=True)

it._uniform_histograms = hist_bf16
hp2 = jax.jit(hist_phase)
out = hp2(d3)
float(np.asarray(out).ravel()[0])
start = time.perf_counter()
for _ in range(8):
    out = hp2(d3 + out.mean() * 0)
float(np.asarray(out).ravel()[0])
print(f"  histogram phase (one rot, bf16): "
      f"{(time.perf_counter() - start) / 8 * 1e3:.1f} ms/batch{BATCH}",
      flush=True)
it._uniform_histograms = orig_hist


def apply_phase(d):
    lo = d.min(axis=1)
    hi = d.max(axis=1)
    step = (hi - lo) / 255
    fp = jnp.linspace(0.0, 255.0, 255)[None].repeat(3, 0) * step[:, None]
    return it._apply_tables_pallas(d, lo + step, step, fp, hi)


ap = jax.jit(jax.vmap(apply_phase))
out = ap(d3)
float(np.asarray(out).ravel()[0])
start = time.perf_counter()
for _ in range(8):
    out = ap(out)
float(np.asarray(out).ravel()[0])
print(f"  apply phase (one rot, pallas): "
      f"{(time.perf_counter() - start) / 8 * 1e3:.1f} ms/batch{BATCH}",
      flush=True)
