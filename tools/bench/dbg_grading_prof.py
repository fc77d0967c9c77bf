"""Grading breakdown @1080p batch4: IDT vs regrain, and regrain internals."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from color_transfer_tpu.methods import iterative as it

print("backend:", jax.default_backend(), flush=True)

B, H, W = 4, 1080, 1920
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (B, H, W, 3), dtype=jnp.float32)
r = jnp.clip(t * 0.9 + 0.05, 0, 1)


def chain(fn, *args, iters=5):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times)


idt_b = jax.jit(jax.vmap(lambda a, b: it.iterative_distribution_transfer(a, b)))
print(f"idt:            {chain(idt_b, t, r)*1e3:6.1f} ms/batch4", flush=True)

grad_b = jax.jit(jax.vmap(lambda a, b: it.automated_color_grading(a, b)))
print(f"grading:        {chain(grad_b, t, r)*1e3:6.1f} ms/batch4", flush=True)

regrain_b = jax.jit(jax.vmap(it._regrain))
print(f"regrain alone:  {chain(regrain_b, t, r)*1e3:6.1f} ms/batch4", flush=True)

# regrain without any sweeps (nbits effectively 0) => pyramid resize cost
regrain_nosweep = jax.jit(jax.vmap(
    lambda a, b: it._regrain(a, b, nbits=(0, 0, 0, 0, 0, 0))
))
print(f"pyramid resizes:{chain(regrain_nosweep, t, r)*1e3:6.1f} ms/batch4", flush=True)

# single level L0 solve only (4 sweeps at full res, XLA path)
solve0 = jax.jit(jax.vmap(lambda a, b: it._solve(a, a, b, 4, 0)))
print(f"L0 solve (4 sweeps XLA): {chain(solve0, t, r)*1e3:6.1f} ms/batch4", flush=True)

# L1-size stencil solve (16 sweeps at 540x960, pallas on tpu)
t1 = t[:, ::2, ::2]
r1 = r[:, ::2, ::2]
solve1 = jax.jit(jax.vmap(lambda a, b: it._solve(a, a, b, 16, 1)))
print(f"L1 solve (16 sweeps stencil): {chain(solve1, t1, r1)*1e3:6.1f} ms/batch4", flush=True)

# invariants alone at L0
inv0 = jax.jit(jax.vmap(lambda a, b: it._solve_invariants(a, b, 0)[0]))
print(f"L0 invariants:  {chain(inv0, t, r)*1e3:6.1f} ms/batch4", flush=True)
