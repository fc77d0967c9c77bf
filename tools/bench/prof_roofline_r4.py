"""Round-4 deep-serving roofline: stage-level measured ms + XLA-counted
FLOPs/bytes at 1080p batch 1, plus device-ceiling micro-measurements.

SUPERSEDED for stage attribution by prof_roofline2_r4.py: standalone
sub-stage jits measure pathologically through the tunnel (the DCMCS3DI
transfer net, <=320 ms inside the full program, measured 14 s standalone;
the fused row-attention matcher 59 ms in-program, 5.3 s standalone).
Full-forward rows and the XLA cost-analysis FLOP/byte counts from this
script remain valid and are quoted in PERF.md.

Usage: python tools/bench/prof_roofline_r4.py [dcmcs3di|dmsct|ceiling|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

H, W = 1080, 1920


def chain_ms(f, *args, iters=6):
    """Chained timing: ONE jitted step per iteration that runs f and folds
    a scalar of its output back into arg 0 (same shape/dtype), so
    iterations serialize through a data dependency with zero eager ops —
    under the remote tunnel every eager op is a slow dispatch and would
    dominate (first version of this harness measured a 3x3 conv at 88 ms
    because of exactly that)."""

    def step(x, *rest):
        out = f(x, *rest)
        lead = jax.tree_util.tree_leaves(out)[0]
        return x + (1e-12 * lead.ravel()[0]).astype(x.dtype)

    step = jax.jit(step)
    sync = jax.jit(lambda x: jnp.ravel(x)[0])
    x = step(*args)  # compile + warm
    float(sync(x))
    t0 = time.perf_counter()
    x = args[0]
    for _ in range(iters):
        x = step(x, *args[1:])
    float(sync(x))
    return (time.perf_counter() - t0) / iters * 1e3


def cost(f, *args):
    """(GFLOP, GB accessed) from XLA cost analysis of the compiled fn."""
    try:
        ca = jax.jit(f).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca.get("flops", 0.0) / 1e9, ca.get("bytes accessed", 0.0) / 1e9
    except Exception as e:  # noqa: BLE001
        print(f"  (cost analysis unavailable: {e})", flush=True)
        return 0.0, 0.0


def report(tag, ms, gflop=None, gb=None):
    extra = ""
    if gflop:
        extra += f"  {gflop:8.1f} GF  {gflop / ms:7.1f} GF/ms={gflop/ms:.1f} TF/s"
    if gb:
        extra += f"  {gb:6.2f} GB  {gb / ms * 1e3:6.1f} GB/s"
    print(f"  {tag:44s} {ms:8.2f} ms{extra}", flush=True)


def bench_ceiling():
    print("== device ceilings ==", flush=True)
    for dt, n in ((jnp.bfloat16, 8192), (jnp.float32, 4096)):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dt)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dt)
        f = jax.jit(lambda x, y: x @ y)
        ms = chain_ms(f, a, b, iters=8)
        tf = 2 * n**3 / ms / 1e9
        print(f"  matmul {n}^3 {np.dtype(dt).name}: {ms:.2f} ms = {tf:.1f} TF/s",
              flush=True)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, H, W, 64), dt)
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64), dt)
        f = jax.jit(
            lambda x, k: jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        ms = chain_ms(f, x, k, iters=8)
        gf = 2 * 9 * 64 * 64 * H * W / 1e9
        print(
            f"  conv3x3 64->64 @1080p {np.dtype(dt).name}: {ms:.2f} ms = "
            f"{gf / ms:.1f} TF/s",
            flush=True,
        )


def bench_dcmcs3di():
    from color_transfer_tpu.models.dcmcs3di import DCMCS3DI
    from color_transfer_tpu.ops.row_attention import fused_parallax_inference

    for cd in (None, "bfloat16"):
        tag = "bf16" if cd else "f32"
        print(f"== dcmcs3di ({tag}) ==", flush=True)
        model = DCMCS3DI(compute_dtype=jnp.dtype(cd) if cd else None)
        left = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
        right = jnp.clip(left * 0.95 + 0.01, 0, 1)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), left[:, :32, :64], right[:, :32, :64]
        )

        full = jax.jit(
            lambda l, r: model.apply(
                params, l, r, inference=True, use_pallas=True
            )[0]
        )
        ms = chain_ms(full, left, right)
        gf, gb = cost(
            lambda l, r: model.apply(params, l, r, inference=True,
                                     use_pallas=True)[0],
            left, right,
        )
        report("full forward", ms, gf, gb)

        extract = jax.jit(
            lambda l, r: model.apply(params, l, r, method=DCMCS3DI._extract)
        )
        ms = chain_ms(extract, left, right)
        gf, gb = cost(
            lambda l, r: model.apply(params, l, r, method=DCMCS3DI._extract),
            left, right,
        )
        report("extraction (both views)", ms, gf, gb)

        fl = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 64))
        fr = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 64))

        def matcher_stage(m, fa, fb):
            head = m.matcher.head(jnp.concatenate([fa, fb], axis=0))
            q_l, q_r = jnp.split(m.matcher.query(head), 2, axis=0)
            k_l, k_r = jnp.split(m.matcher.key(head), 2, axis=0)
            return fused_parallax_inference(
                q_l=q_l, k_r=k_r, v_r=m.matcher.value(fb),
                q_r=q_r, k_l=k_l, scale=1.0 / m.channels,
            )

        match = jax.jit(
            lambda a, b: model.apply(params, a, b, method=matcher_stage)
        )
        ms = chain_ms(match, fl, fr)
        gf, gb = cost(
            lambda a, b: model.apply(params, a, b, method=matcher_stage),
            fl, fr,
        )
        report("matcher (qkv + fused row attention)", ms, gf, gb)

        xt = jax.random.normal(jax.random.PRNGKey(3), (1, H, W, 129))

        def transfer_stage(m, x):
            return m.transfer(x)

        trans = jax.jit(lambda x: model.apply(params, x, method=transfer_stage))
        ms = chain_ms(trans, xt)
        gf, gb = cost(lambda x: model.apply(params, x, method=transfer_stage), xt)
        report("transfer net", ms, gf, gb)


def bench_dmsct():
    from color_transfer_tpu.models.dmsct import DMSCT
    from color_transfer_tpu.core.resize import derive_matcher_size

    for recipe in (False, True):
        tag = "bf16 recipe" if recipe else "f32"
        print(f"== dmsct ({tag}) ==", flush=True)
        kwargs = (
            dict(
                matcher_corr_dtype="bfloat16",
                matcher_compute_dtype="bfloat16",
                corrector_compute_dtype="bfloat16",
            )
            if recipe
            else {}
        )
        model = DMSCT(**kwargs)
        t = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
        r = jnp.clip(t * 0.95 + 0.01, 0, 1)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            t[:, :64, :64],
            r[:, :64, :64],
        )

        full = jax.jit(lambda a, b: model.apply(params, a, b))
        ms = chain_ms(full, t, r)
        gf, gb = cost(lambda a, b: model.apply(params, a, b), t, r)
        report("full forward", ms, gf, gb)

        msize = derive_matcher_size(H, W, max_area=model.matcher_max_area)

        def matcher_stage(m, a, b):
            return m.matcher(
                a * 255.0, b * 255.0, pred_bidir_flow=True,
                fwd_bwd_consistency_check=True, inference_size=msize,
            )["flow"]

        match = jax.jit(lambda a, b: model.apply(params, a, b, method=matcher_stage))
        ms = chain_ms(match, t, r)
        gf, gb = cost(
            lambda a, b: model.apply(params, a, b, method=matcher_stage), t, r
        )
        report(f"matcher total (cap {msize})", ms, gf, gb)

        pad_h, pad_w = (-H) % 16, (-W) % 16
        tp = jnp.pad(t, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")

        def encoder_stage(m, x):
            return m.encoder(x, train=False)

        enc = jax.jit(lambda x: model.apply(params, x, method=encoder_stage))
        ms = chain_ms(enc, tp)
        gf, gb = cost(lambda x: model.apply(params, x, method=encoder_stage), tp)
        report("encoder (ONE view; fwd runs it twice)", ms, gf, gb)

        def corrector_stage(m, target, reference, flow, fwd_occ):
            # __call__ minus the matcher (flow/occ provided).
            from color_transfer_tpu.core.resize import (
                resize_nearest,
                upsample_flow_bilinear,
            )
            from color_transfer_tpu.core.sampling import flow_warp_batched

            height, width = target.shape[1:3]
            factor = 2**m.encoder_depth
            ph, pw = (-height) % factor, (-width) % factor

            def pad(x):
                return jnp.pad(
                    x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge"
                )

            flow = pad(flow)
            not_occ = pad(1.0 - fwd_occ)
            f_t = m.encoder(pad(target), train=False)
            f_r = m.encoder(pad(reference), train=False)
            features = []
            for idx, (ft, fr_) in enumerate(zip(f_t, f_r)):
                ft = ft.astype(jnp.float32)
                fr_ = fr_.astype(jnp.float32)
                fl = upsample_flow_bilinear(flow, 2.0**-idx) if idx else flow
                warped = flow_warp_batched(fr_, fl)
                occ = (
                    jnp.moveaxis(
                        resize_nearest(
                            jnp.moveaxis(not_occ, -1, 1), fl.shape[1:3]
                        ),
                        1,
                        -1,
                    )
                    if idx
                    else not_occ
                )
                features.append(
                    jnp.concatenate([ft, warped, occ], axis=-1)
                )
            res = m.head(m.decoder(*features)).astype(jnp.float32)
            return jnp.clip(target + res[:, :height, :width, :], 0, 1)

        flow0 = jax.random.normal(jax.random.PRNGKey(4), (1, H, W, 2)) * 4
        occ0 = (
            jax.random.uniform(jax.random.PRNGKey(5), (1, H, W, 1)) > 0.9
        ).astype(jnp.float32)
        corr = jax.jit(
            lambda a, b, fl, oc: model.apply(
                params, a, b, fl, oc, method=corrector_stage
            )
        )
        ms = chain_ms(corr, t, r, flow0, occ0)
        gf, gb = cost(
            lambda a, b, fl, oc: model.apply(
                params, a, b, fl, oc, method=corrector_stage
            ),
            t, r, flow0, occ0,
        )
        report("corrector (2x encoder + warps + decoder)", ms, gf, gb)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ceiling", "all"):
        bench_ceiling()
    if which in ("dcmcs3di", "all"):
        bench_dcmcs3di()
    if which in ("dmsct", "all"):
        bench_dmsct()
