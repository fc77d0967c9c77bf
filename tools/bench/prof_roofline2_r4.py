"""Round-4 roofline, ablation-based. Standalone sub-stage jits measure
pathologically through the tunnel (a transfer net that costs <=320 ms
inside the full program measures 14 s standalone — see
prof_roofline_r4.py history); marginal LAYER-COUNT ablations inside the
full program are the trustworthy attribution. Each row below differs from
the full config by one knob; the delta is that component's in-context cost.

Usage: python tools/bench/prof_roofline2_r4.py [dcmcs3di|dmsct|ceiling]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

H, W = 1080, 1920


def chain_ms(f, *args, iters=6):
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


def bench_ceiling():
    print("== device ceilings (per-op, in one jitted chain) ==", flush=True)
    for dt, n in ((jnp.bfloat16, 8192), (jnp.float32, 4096)):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dt)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dt)
        ms = chain_ms(lambda x, y: x @ y, a, b, iters=8)
        print(
            f"  matmul {n}^3 {np.dtype(dt).name}: {ms:.2f} ms = "
            f"{2 * n**3 / ms / 1e9:.1f} TF/s",
            flush=True,
        )
    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W, 64), dt)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64), dt)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ms = chain_ms(conv, x, k, iters=8)
        gf = 2 * 9 * 64 * 64 * H * W / 1e9
        hbm = 2 * H * W * 64 * np.dtype(dt).itemsize / 1e9  # in + out
        print(
            f"  conv3x3 64->64 @1080p {np.dtype(dt).name}: {ms:.2f} ms = "
            f"{gf / ms:.1f} TF/s ({hbm / ms * 1e3:.0f} GB/s of {hbm:.2f} GB "
            "min traffic)",
            flush=True,
        )
    # 10-conv chain: does XLA amortize HBM traffic across convs at all?
    x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W, 64), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64), jnp.float32)

    def conv10(x, k):
        for _ in range(10):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return x

    ms = chain_ms(conv10, x, k, iters=6)
    print(f"  conv3x3 x10 chain f32: {ms:.2f} ms = {ms / 10:.2f} ms/conv",
          flush=True)


def _time_dcmcs3di(extraction_layers, transfer_layers, compute_dtype, iters=5):
    from color_transfer_tpu.models.dcmcs3di import DCMCS3DI

    model = DCMCS3DI(
        extraction_layers=extraction_layers,
        transfer_layers=transfer_layers,
        compute_dtype=jnp.dtype(compute_dtype) if compute_dtype else None,
    )
    left = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
    right = jnp.clip(left * 0.95 + 0.01, 0, 1)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), left[:, :32, :64], right[:, :32, :64]
    )
    return chain_ms(
        lambda l, r: model.apply(params, l, r, inference=True,
                                 use_pallas=True)[0],
        left, right, iters=iters,
    )


def bench_dcmcs3di():
    for cd in (None, "bfloat16"):
        tag = "bf16" if cd else "f32"
        print(f"== dcmcs3di ablations ({tag}) @1080p b1 ==", flush=True)
        t_full = _time_dcmcs3di(18, 6, cd)
        print(f"  full (18 ext ResB, 6 tr ResB): {t_full:.1f} ms", flush=True)
        t_ext9 = _time_dcmcs3di(9, 6, cd)
        print(
            f"  9 ext ResB: {t_ext9:.1f} ms -> extraction ResB "
            f"{(t_full - t_ext9) / 9:.1f} ms/block (x18 = "
            f"{(t_full - t_ext9) * 2:.0f} ms)",
            flush=True,
        )
        t_tr1 = _time_dcmcs3di(18, 1, cd)
        print(
            f"  1 tr ResB: {t_tr1:.1f} ms -> transfer ResB "
            f"{(t_full - t_tr1) / 5:.1f} ms/block (x6 = "
            f"{(t_full - t_tr1) * 6 / 5:.0f} ms)",
            flush=True,
        )
        t_min = _time_dcmcs3di(1, 1, cd)
        print(
            f"  minimal (1,1): {t_min:.1f} ms (matcher + head convs + "
            "clip/concat floor)",
            flush=True,
        )


def _time_dmsct(iters=4, recipe=False, **kw):
    from color_transfer_tpu.models.dmsct import DMSCT

    kwargs = (
        dict(
            matcher_corr_dtype="bfloat16",
            matcher_compute_dtype="bfloat16",
            corrector_compute_dtype="bfloat16",
        )
        if recipe
        else {}
    )
    kwargs.update(kw)
    model = DMSCT(**kwargs)
    t = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
    r = jnp.clip(t * 0.95 + 0.01, 0, 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        t[:, :64, :64],
        r[:, :64, :64],
    )
    return chain_ms(lambda a, b: model.apply(params, a, b), t, r, iters=iters)


def bench_dmsct():
    for recipe in (False, True):
        tag = "bf16 recipe" if recipe else "f32"
        print(f"== dmsct ablations ({tag}) @1080p b1 ==", flush=True)
        t_full = _time_dmsct(recipe=recipe)
        print("  full (6 tl, 6 gru): %.1f ms" % t_full, flush=True)
        t_g1 = _time_dmsct(recipe=recipe, matcher_num_reg_refine=1)
        print(
            f"  1 gru: {t_g1:.1f} ms -> GRU iter {(t_full - t_g1) / 5:.1f} "
            f"ms (x6 = {(t_full - t_g1) * 6 / 5:.0f} ms)",
            flush=True,
        )
        t_l1 = _time_dmsct(recipe=recipe, matcher_num_layers=1)
        print(
            f"  1 transformer layer: {t_l1:.1f} ms -> layer "
            f"{(t_full - t_l1) / 5:.1f} ms (x6 both scales = "
            f"{(t_full - t_l1) * 6 / 5:.0f} ms)",
            flush=True,
        )
        t_min = _time_dmsct(
            recipe=recipe, matcher_num_reg_refine=1, matcher_num_layers=1
        )
        print(
            f"  minimal matcher (1 tl, 1 gru): {t_min:.1f} ms "
            "(corrector + CNN encoder + correlations + warps floor)",
            flush=True,
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ceiling", "all"):
        bench_ceiling()
    if which in ("dcmcs3di", "all"):
        bench_dcmcs3di()
    if which in ("dmsct", "all"):
        bench_dmsct()
