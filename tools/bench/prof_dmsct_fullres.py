"""Fullres DMSCT breakdown: matcher internals at the 512x896 cap (bf16)."""
import time, numpy as np, jax, jax.numpy as jnp
from color_transfer_tpu.models.gmflow import GMFlow
print("backend:", jax.default_backend(), flush=True)

key = jax.random.PRNGKey(0)
tm = jax.random.uniform(key, (1, 512, 896, 3)) * 255.0
rm = jnp.clip(tm * 0.95 + 2.0, 0, 255)

def chain_ms(f, x, iters=6):
    out = f(x); float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x + 1e-12 * jnp.asarray(out).ravel()[0])
    float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3

def run(tag, **kw):
    mat = GMFlow(corr_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16, **kw)
    v = jax.jit(lambda k: mat.init(k, tm, rm))(key)
    f = jax.jit(lambda x: mat.apply(v, x, rm)["flow"])
    print(f"{tag}: {chain_ms(f, tm):.1f} ms", flush=True)

run("matcher bidir+occ 6gru 6tl")
run("matcher bidir+occ 1gru 6tl", num_reg_refine=1)
run("matcher bidir+occ 6gru 1tl", num_transformer_layers=1)
