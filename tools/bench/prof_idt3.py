import time, jax, jax.numpy as jnp, numpy as np
import color_transfer_tpu.methods.iterative as it
print("backend:", jax.default_backend(), flush=True)
B, H, W = 4, 1080, 1920
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (B, H, W, 3), dtype=jnp.float32)
r = jnp.clip(t * 0.9 + 0.05, 0, 1)
def chain_ms(fn, iters=8):
    f = jax.jit(jax.vmap(fn))
    acc = f(t, r); float(acc.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters): acc = f(jnp.clip(acc, 0, 1), r)
    assert np.isfinite(float(acc.mean()))
    return (time.perf_counter() - t0) / iters * 1e3
for rep in range(3):
    ms_i = chain_ms(lambda a,b: it.iterative_distribution_transfer(a,b))
    ms_g = chain_ms(lambda a,b: it.automated_color_grading(a,b))
    print(f"rep{rep}: idt {ms_i:.1f} ms ({4000/ms_i:.1f} fps)  grading {ms_g:.1f} ms ({4000/ms_g:.1f} fps)", flush=True)
