"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: corrected 1080p stereo frames/sec for the Monge-Kantorovitch
linear transfer (the best classical method on the real-world dataset,
BASELINE.md), measured on the attached TPU chip. The BASELINE.json
north-star is >=300 fps on a v5e-8 slice, i.e. 37.5 frames/sec/chip —
``vs_baseline`` is the ratio against that per-chip share.

Secondary benches (other methods, deep models as they land) print to stderr.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu import methods

H, W = 1080, 1920
BASELINE_PER_CHIP_FPS = 300.0 / 8.0


def _timeit_chained(fn, target, reference, iters=16):
    """Chain each iteration's output into the next input and force a host
    read at the end — the runtime's block_until_ready is asynchronous under
    the TPU tunnel, so only a data dependency + host transfer gives honest
    wall-clock numbers."""
    out = fn(target, reference)
    float(out.mean())  # compile + warm
    acc = target
    start = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc, reference)
    assert np.isfinite(float(acc.mean()))
    return (time.perf_counter() - start) / iters


def bench_classical(name, batch=8, iters=16):
    fn = methods.get_method(name)
    batched = jax.jit(jax.vmap(fn))
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    target = jax.random.uniform(k1, (batch, H, W, 3), dtype=jnp.float32)
    reference = jnp.clip(
        target * 0.9 + 0.05 + 0.02 * jax.random.normal(k2, target.shape), 0, 1
    )
    dt = _timeit_chained(batched, target, reference, iters=iters)
    return batch / dt


def bench_dcmcs3di(iters=4, compute_dtype=None):
    """Full-size DCMCS3DI 1080p inference through the fused Pallas matcher
    (the reference cannot run full-res at all — demo.ipynb cell 24).
    compute_dtype="bfloat16" measures the opt-in mixed-precision recipe
    (configs/dcmcs3di.yaml) — extraction/transfer convs bf16, matcher f32."""
    from color_transfer_tpu.models.dcmcs3di import DCMCS3DI

    model = DCMCS3DI(
        compute_dtype=jnp.dtype(compute_dtype) if compute_dtype else None
    )
    left = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
    right = jnp.clip(left * 0.95 + 0.01, 0, 1)
    params = model.init(jax.random.PRNGKey(0), left[:, :32, :64], right[:, :32, :64])
    fwd = jax.jit(
        lambda p, l, r: model.apply(p, l, r, inference=True, use_pallas=True)[0]
    )
    out = fwd(params, left, right)
    assert np.isfinite(float(out.mean()))
    acc = left
    start = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, right)
    assert np.isfinite(float(acc.mean()))
    return 1.0 / ((time.perf_counter() - start) / iters)


def bench_dmsct(iters=6, recipe=False, fused_attention="auto"):
    """DMSCT 1080p inference (matcher capped at 512x896 per the reference's
    resolution policy, corrector at full res). recipe=True measures the
    parity-gated throughput settings (configs/dmsct.yaml: bf16 matcher
    correlation/compute) plus the opt-in bf16 corrector. fused_attention
    follows the model's dtype-aware "auto" default (fused Pallas window
    attention exactly when the matcher compute dtype is bf16 — PERF.md);
    pass False/True to attribute the kernels' contribution."""
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
    kwargs["matcher_fused_attention"] = fused_attention
    model = DMSCT(**kwargs)
    t = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))
    r = jnp.clip(t * 0.95 + 0.01, 0, 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        t[:, :64, :64],
        r[:, :64, :64],
    )
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    out = fwd(params, t, r)
    assert np.isfinite(float(out.mean()))
    acc = t
    start = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, r)
    assert np.isfinite(float(acc.mean()))
    return 1.0 / ((time.perf_counter() - start) / iters)


def check_idt_kernel_integrity():
    """Compiled-vs-interpret equality of the IDT transport-apply kernel at
    its PINNED 32-sublane block size on the real chip. The kernel is pinned
    because >=64-sublane blocks miscompile (0.04% wrong lanes — see
    tools/mosaic_repro.py); this guards against the pin silently regressing
    with a toolchain update."""
    from color_transfer_tpu.methods.iterative import _apply_tables_pallas

    rng = np.random.default_rng(7)
    d0 = jnp.asarray(rng.normal(size=(3, 32 * 128 * 4)).astype(np.float32))
    grid_lo = jnp.asarray([-3.0, -2.5, -3.5])
    step = jnp.asarray([0.02, 0.025, 0.03])
    fp = jnp.asarray(
        np.sort(rng.normal(size=(3, 255)), axis=1).astype(np.float32) * 50
    )
    right_edge = grid_lo + step * 254

    compiled = np.asarray(
        jax.jit(_apply_tables_pallas)(d0, grid_lo, step, fp, right_edge)
    )
    interp = np.asarray(
        _apply_tables_pallas(d0, grid_lo, step, fp, right_edge, interpret=True)
    )
    bad = np.abs(compiled - interp) > 1e-4
    assert not bad.any(), (
        f"IDT apply kernel compiled/interpret divergence: {bad.mean():.5%} "
        "of elements — the Mosaic one-hot miscompile may have spread to the "
        "pinned 32-sublane size (tools/mosaic_repro.py)"
    )
    print("[bench] idt kernel integrity: compiled == interpret", file=sys.stderr)


def check_local_corr_kernel_integrity():
    """Compiled-vs-interpret agreement of both local-correlation Pallas
    schedules (ops/local_corr.py) on the real chip — the same guard the IDT
    kernel has: a toolchain update that miscompiles either schedule shows up
    here instead of as silent flow drift inside the frozen matcher."""
    from color_transfer_tpu.ops.local_corr import (
        local_correlation_with_flow_pallas,
    )

    rng = np.random.default_rng(11)
    b, h, w, c, r = 1, 16, 128, 128, 4
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-3, 3, (b, h, w, 2)).astype(np.float32))
    for variant in ("vpu", "mxu"):
        for dtype in (jnp.float32, jnp.bfloat16):
            kw = dict(
                local_radius=r, corr_dtype=dtype, p_blk=256, variant=variant
            )
            compiled = np.asarray(
                jax.jit(
                    functools.partial(local_correlation_with_flow_pallas, **kw)
                )(f0, f1, flow)
            )
            interp = np.asarray(
                local_correlation_with_flow_pallas(
                    f0, f1, flow, interpret=True, **kw
                )
            )
            # f32 products accumulate identically; tolerance covers the
            # different-order window sums only.
            bad = np.abs(compiled - interp) > 5e-4 * c
            assert not bad.any(), (
                f"local-corr {variant}/{np.dtype(dtype).name}: "
                f"{bad.mean():.5%} of elements diverge compiled-vs-interpret"
            )
    print(
        "[bench] local-corr kernel integrity: compiled == interpret "
        "(vpu+mxu, f32+bf16)",
        file=sys.stderr,
    )


def check_win_attention_kernel_integrity():
    """Compiled-vs-interpret agreement of the fused windowed-attention
    kernel (ops/win_attention.py) on the real chip, masked + unmasked,
    f32 + bf16 — the same toolchain guard the other Pallas kernels have."""
    from color_transfer_tpu.ops.win_attention import window_attention_fused

    rng = np.random.default_rng(13)
    bp, length, c, n_mask = 16, 120, 128, 4
    mk = lambda: jnp.asarray(rng.normal(size=(bp, length, c)).astype(np.float32))
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(
        np.where(rng.uniform(size=(n_mask, length, length)) > 0.7, -100.0, 0.0)
        .astype(np.float32)
    )
    # (tag, mask operand, shift_windows geometry) — geometry is the mode
    # the DMSCT routing actually uses for shifted layers.
    variants = [
        ("unmasked", None, None),
        ("masked", mask, None),
        ("geometry", None, (4, 10, 12)),  # k*k = 16 = bp; hs*ws = 120 = L
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        qq, kk, vv = (x.astype(dtype) for x in (q, k, v))
        for tag, m, geom in variants:
            compiled = np.asarray(
                jax.jit(
                    lambda a, b, d: window_attention_fused(
                        a, b, d, m, shift_windows=geom
                    )
                )(qq, kk, vv),
                dtype=np.float32,
            )
            interp = np.asarray(
                window_attention_fused(
                    qq, kk, vv, m, shift_windows=geom, interpret=True
                ),
                dtype=np.float32,
            )
            tol = 1e-5 if dtype == jnp.float32 else 2e-2
            bad = np.abs(compiled - interp) > tol
            assert not bad.any(), (
                f"win-attention {np.dtype(dtype).name} {tag}: "
                f"{bad.mean():.5%} of elements diverge compiled-vs-interpret"
            )
    # Whole-sublayer kernel (q/kv projections + attention + merge) — the
    # mode the DMSCT fused routing actually uses.
    from color_transfer_tpu.ops.win_attention import window_sublayer_fused

    wq = jnp.asarray((rng.normal(size=(c, c)) / np.sqrt(c)).astype(np.float32))
    wkv = jnp.asarray(
        (rng.normal(size=(c, 2 * c)) / np.sqrt(c)).astype(np.float32)
    )
    wm = jnp.asarray((rng.normal(size=(c, c)) / np.sqrt(c)).astype(np.float32))
    ns = jnp.asarray((1 + 0.1 * rng.normal(size=c)).astype(np.float32))
    nb = jnp.asarray((0.1 * rng.normal(size=c)).astype(np.float32))
    for dtype in (jnp.float32, jnp.bfloat16):
        xs = q.astype(dtype)
        xt = k.astype(dtype)
        ws_ = tuple(x.astype(dtype) for x in (wq, wkv, wm))
        for tag, geom in (("plain", None), ("geometry", (4, 10, 12))):
            compiled = np.asarray(
                jax.jit(
                    lambda a, b: window_sublayer_fused(
                        a, b, *ws_, ns, nb, shift_windows=geom,
                        add_residual=True,
                    )
                )(xs, xt),
                dtype=np.float32,
            )
            interp = np.asarray(
                window_sublayer_fused(
                    xs, xt, *ws_, ns, nb, shift_windows=geom,
                    add_residual=True, interpret=True
                ),
                dtype=np.float32,
            )
            tol = 1e-4 if dtype == jnp.float32 else 5e-2
            bad = np.abs(compiled - interp) > tol
            assert not bad.any(), (
                f"win-sublayer {np.dtype(dtype).name} {tag}: "
                f"{bad.mean():.5%} of elements diverge compiled-vs-interpret"
            )
    # Fused FFN kernel (the third routed mode).
    from color_transfer_tpu.ops.win_attention import ffn_fused

    w0 = jnp.asarray(
        (rng.normal(size=(2 * c, 512)) / np.sqrt(2 * c)).astype(np.float32)
    )
    w2 = jnp.asarray(
        (rng.normal(size=(512, c)) / np.sqrt(512)).astype(np.float32)
    )
    for dtype in (jnp.float32, jnp.bfloat16):
        xs, xm = q.astype(dtype), k.astype(dtype)
        a0, a2 = w0.astype(dtype), w2.astype(dtype)
        compiled = np.asarray(
            jax.jit(
                lambda a, b: ffn_fused(a, b, a0, a2, ns, nb,
                                       add_residual=True)
            )(xs, xm),
            dtype=np.float32,
        )
        interp = np.asarray(
            ffn_fused(xs, xm, a0, a2, ns, nb, add_residual=True,
                      interpret=True),
            dtype=np.float32,
        )
        tol = 1e-4 if dtype == jnp.float32 else 5e-2
        bad = np.abs(compiled - interp) > tol
        assert not bad.any(), (
            f"ffn kernel {np.dtype(dtype).name}: {bad.mean():.5%} of "
            "elements diverge compiled-vs-interpret"
        )
    print(
        "[bench] win-attention kernel integrity: compiled == interpret "
        "(attention f32+bf16 unmasked+masked+geometry; sublayer "
        "f32+bf16 plain+geometry; ffn f32+bf16)",
        file=sys.stderr,
    )


def main():
    results = {}
    try:
        check_idt_kernel_integrity()
    except Exception as e:  # noqa: BLE001
        print(f"[bench] IDT KERNEL INTEGRITY FAILURE: {e}", file=sys.stderr)
    try:
        check_local_corr_kernel_integrity()
    except Exception as e:  # noqa: BLE001
        print(
            f"[bench] LOCAL-CORR KERNEL INTEGRITY FAILURE: {e}",
            file=sys.stderr,
        )
    try:
        check_win_attention_kernel_integrity()
    except Exception as e:  # noqa: BLE001
        print(
            f"[bench] WIN-ATTENTION KERNEL INTEGRITY FAILURE: {e}",
            file=sys.stderr,
        )
    for name in ["monge_kantorovitch", "reinhard", "correlated_color_space"]:
        try:
            results[name] = bench_classical(name)
            print(f"[bench] {name}: {results[name]:.1f} 1080p frames/sec", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {name} failed: {e}", file=sys.stderr)
    for name, batch in [("idt", 4), ("automated_color_grading", 4)]:
        try:
            results[name] = bench_classical(name, batch=batch, iters=5)
            print(
                f"[bench] {name}: {results[name]:.1f} 1080p frames/sec",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {name} failed: {e}", file=sys.stderr)
    try:
        results["dcmcs3di"] = bench_dcmcs3di()
        print(
            f"[bench] dcmcs3di full-res: {results['dcmcs3di']:.2f} 1080p frames/sec",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] dcmcs3di failed: {e}", file=sys.stderr)
    try:
        fps = results["dcmcs3di_bf16"] = bench_dcmcs3di(compute_dtype="bfloat16")
        print(
            f"[bench] dcmcs3di full-res bf16 recipe: {fps:.2f} 1080p frames/sec",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] dcmcs3di bf16 failed: {e}", file=sys.stderr)
    try:
        results["dmsct"] = bench_dmsct()
        print(
            f"[bench] dmsct full-res: {results['dmsct']:.2f} 1080p frames/sec",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] dmsct failed: {e}", file=sys.stderr)
    try:
        fps = results["dmsct_bf16_recipe"] = bench_dmsct(recipe=True)
        print(
            f"[bench] dmsct full-res bf16 recipe: {fps:.2f} 1080p frames/sec",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] dmsct bf16 recipe failed: {e}", file=sys.stderr)
    try:
        fps = results["dmsct_bf16_nofuse"] = bench_dmsct(
            recipe=True, fused_attention=False
        )
        print(
            f"[bench] dmsct full-res bf16 recipe w/o fused kernels: {fps:.2f} "
            "1080p frames/sec",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] dmsct bf16 w/o fused failed: {e}", file=sys.stderr)

    headline = results.get("monge_kantorovitch", 0.0)
    print(
        json.dumps(
            {
                "metric": "mk_1080p_stereo_frames_per_sec_per_chip",
                "value": round(headline, 2),
                "unit": "frames/sec",
                "vs_baseline": round(headline / BASELINE_PER_CHIP_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
