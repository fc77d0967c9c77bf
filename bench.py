"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: corrected 1080p stereo frames/sec for the Monge-Kantorovitch
linear transfer (the best classical method on the real-world dataset,
BASELINE.md), measured on the attached TPU chip. The BASELINE.json
north-star is >=300 fps on a v5e-8 slice, i.e. 37.5 frames/sec/chip —
``vs_baseline`` is the ratio against that per-chip share.

The headline JSON is printed to stdout IMMEDIATELY after the MK
measurement; every other section (secondary methods, deep models, the
kernel-integrity canaries, the predict-CLI smoke) streams to stderr under
a wall-clock budget guard (``BENCH_BUDGET_SECONDS``, default 900) so the
driver's external timeout can never swallow the headline again (round 3
lost its official number to an rc=124 kill — VERDICT.md Weak #1).
"""

import functools
import json
import os
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
    full-bf16 throughput settings (bf16 matcher correlation/compute + bf16
    corrector); recipe="refine32" measures the SELECTIVE recipe (bf16
    confined to backbone/transformer/corrector, flow arithmetic pinned f32
    — the gate-passing fast configuration, configs/dmsct.yaml).
    fused_attention follows the model's dtype-aware "auto" default (fused
    Pallas window attention exactly when the matcher compute dtype is bf16
    — PERF.md); pass False/True to attribute the kernels' contribution."""
    from color_transfer_tpu.models.dmsct import DMSCT

    if recipe == "bf16c":
        # Corrector-only bf16 — the gate-PASSING fast recipe (the matcher
        # stays bit-strict f32: round-5 gates showed ANY matcher bf16 —
        # even confined to feature values with flow arithmetic pinned f32
        # — saturates to the same 0.11 dB drift through the chaotic GRU
        # amplification; PARITY_RESULTS.md round-5).
        kwargs = dict(corrector_compute_dtype="bfloat16")
    elif recipe:
        kwargs = dict(
            matcher_corr_dtype="bfloat16",
            matcher_compute_dtype="bfloat16",
            corrector_compute_dtype="bfloat16",
        )
        if recipe == "refine32":
            kwargs["matcher_refine_dtype"] = "float32"
    else:
        kwargs = {}
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


def check_misc_kernel_integrity():
    """Compiled-vs-interpret agreement for the three Pallas families the
    other canaries do not cover — conv-chain (ops/conv_chain.py), regrain
    stencil (ops/regrain_stencil.py), fused row attention
    (ops/row_attention.py) — at small shapes. These are miscompile guards
    (the Mosaic one-hot bug zeroed 0.04% of lanes silently), not precision
    tests: tolerances allow accumulation-order drift, not wrong lanes."""
    from color_transfer_tpu.ops.conv_chain import resb_chain
    from color_transfer_tpu.ops.regrain_stencil import regrain_sweeps_pallas
    from color_transfer_tpu.ops.row_attention import row_attention_warp

    rng = np.random.default_rng(17)

    # conv-chain: bf16 operands round identically compiled/interpret.
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 256, 16)).astype(np.float32))
    kern = jnp.asarray(
        (rng.normal(size=(2, 2, 3, 3, 16, 16)) * 0.1).astype(np.float32)
    )
    bias = jnp.asarray((rng.normal(size=(2, 2, 16)) * 0.01).astype(np.float32))
    args = dict(group=2, rows=32, compute_dtype=jnp.bfloat16)
    compiled = np.asarray(resb_chain(x, kern, bias, **args))
    interp = np.asarray(resb_chain(x, kern, bias, interpret=True, **args))
    scale = np.abs(interp).max() + 1e-6
    bad = np.abs(compiled - interp) > 5e-2 * scale
    assert not bad.any(), (
        f"conv-chain compiled/interpret divergence: {bad.mean():.5%}"
    )

    # regrain stencil (pure f32 VPU adds/muls — tight tolerance).
    img = jnp.asarray(rng.uniform(0, 1, (64, 128, 3)).astype(np.float32))
    const = jnp.asarray(rng.uniform(0, 1, (64, 128, 3)).astype(np.float32))
    phis = jnp.asarray(rng.uniform(0, 1, (4, 64, 128)).astype(np.float32))
    invd = jnp.asarray(rng.uniform(0.1, 1, (64, 128)).astype(np.float32))
    compiled = np.asarray(
        jax.jit(functools.partial(regrain_sweeps_pallas, nbit=4))(
            img, const, phis, invd
        )
    )
    interp = np.asarray(
        regrain_sweeps_pallas(img, const, phis, invd, nbit=4, interpret=True)
    )
    bad = np.abs(compiled - interp) > 1e-4
    assert not bad.any(), (
        f"regrain stencil compiled/interpret divergence: {bad.mean():.5%}"
    )

    # fused row attention (q k^T softmax warp + colsum).
    mk = lambda c: jnp.asarray(
        rng.normal(size=(1, 16, 128, c)).astype(np.float32)
    )
    q, k, v = mk(32), mk(32), mk(32)
    compiled = jax.jit(
        lambda a, b, c: row_attention_warp(a, b, c, scale=1 / 32.0)
    )(q, k, v)
    interp = row_attention_warp(q, k, v, scale=1 / 32.0, interpret=True)
    for got, want, tag in (
        (compiled[0], interp[0], "warped"),
        (compiled[1], interp[1], "colsum"),
    ):
        g, w_ = np.asarray(got), np.asarray(want)
        sc = np.abs(w_).max() + 1e-6
        bad = np.abs(g - w_) > 2e-2 * sc
        assert not bad.any(), (
            f"row-attention {tag} compiled/interpret divergence: "
            f"{bad.mean():.5%}"
        )
    print(
        "[bench] misc kernel integrity: compiled == interpret "
        "(conv-chain bf16, regrain stencil f32, row attention)",
        file=sys.stderr,
    )


def check_predict_smoke():
    """One 1080p pair through the real ``predict`` CLI surface with a
    random-init DMSCT — covers the serving path (run/predict.py +
    methods/video.py sharded batching) on hardware, not only the CPU test
    suite. Reference analogue: demo.ipynb cells 24-26 (inference surface)."""
    import tempfile

    from PIL import Image

    from color_transfer_tpu.run.cli import main as cli_main

    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as d:
        for tag in ("L", "R"):
            img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(f"{d}/0001_{tag}.png")
        cli_main(
            [
                "predict",
                "--method",
                "dmsct",
                "--target",
                f"{d}/0001_L.png",
                "--reference",
                f"{d}/0001_R.png",
                "--output",
                f"{d}/out.png",
            ]
        )
        out = np.asarray(Image.open(f"{d}/out.png"))
        assert out.shape == (H, W, 3), out.shape
    print("[bench] predict CLI smoke (dmsct, 1080p, random init): ok", file=sys.stderr)


def main():
    t0 = time.monotonic()
    # 1400 s: a warm-cache full pass needs ~450 s, but the tunnel shows
    # freak ~900 s stalls in a single (cached!) section (round-5: the same
    # headline took 225 s and 932 s in runs 20 min apart). The round-4
    # driver run proves the external timeout exceeds 1516 s, and the
    # headline JSON is printed+flushed before any section runs, so a late
    # external kill cannot lose the record — the budget only decides how
    # much of the tail gets measured.
    budget = float(os.environ.get("BENCH_BUDGET_SECONDS", "1400"))

    from color_transfer_tpu import compile_cache

    cache_dir = compile_cache._enabled_dir
    try:
        n_cached = len(os.listdir(cache_dir)) if cache_dir else 0
    except OSError:
        n_cached = 0
    print(
        f"[bench] persistent compile cache: {cache_dir or 'DISABLED'} "
        f"({n_cached} entries)",
        file=sys.stderr,
    )

    def remaining():
        return budget - (time.monotonic() - t0)

    results = {}

    # ------------------------------------------------------------------
    # Headline FIRST (VERDICT r3 Weak #1): measure MK, print the JSON,
    # flush — an external kill after this point cannot lose the record.
    # ------------------------------------------------------------------
    try:
        results["monge_kantorovitch"] = bench_classical("monge_kantorovitch")
        print(
            f"[bench] monge_kantorovitch: "
            f"{results['monge_kantorovitch']:.1f} 1080p frames/sec",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] monge_kantorovitch failed: {e}", file=sys.stderr)
    headline = results.get("monge_kantorovitch", 0.0)
    print(
        json.dumps(
            {
                "metric": "mk_1080p_stereo_frames_per_sec_per_chip",
                "value": round(headline, 2),
                "unit": "frames/sec",
                "vs_baseline": round(headline / BASELINE_PER_CHIP_FPS, 3),
            }
        ),
        flush=True,
    )

    # ------------------------------------------------------------------
    # Secondary sections, each gated on the remaining wall-clock budget.
    # ``est`` is a conservative per-section cost (compile + timed iters,
    # tunnel compiles are minutes-slow); a section only starts if it can
    # plausibly finish, otherwise it and everything after it are skipped
    # with an explicit note.
    # ------------------------------------------------------------------
    def classical(name, batch=8, iters=16):
        def run():
            results[name] = bench_classical(name, batch=batch, iters=iters)
            print(
                f"[bench] {name}: {results[name]:.1f} 1080p frames/sec",
                file=sys.stderr,
            )

        return run

    def deep(key, label, thunk):
        def run():
            fps = results[key] = thunk()
            print(f"[bench] {label}: {fps:.2f} 1080p frames/sec", file=sys.stderr)

        return run

    # ``est`` values are calibrated from a WARM-CACHE run (round 5,
    # 2026-08-21: full 14-section warm pass = 752 s total) times a ~1.5x
    # safety margin — the persistent compilation cache
    # (color_transfer_tpu/compile_cache.py, enabled at import) makes every
    # driver run after the first warm, so estimates sized for cold tunnel
    # compiles would starve the tail sections (round-4 lost 13 of 14
    # sections that way). A cold cache still cannot lose the headline —
    # it is printed before any section runs.
    sections = [
        ("reinhard", 45, classical("reinhard")),
        ("correlated_color_space", 45, classical("correlated_color_space")),
        ("idt", 55, classical("idt", batch=4, iters=5)),
        (
            "automated_color_grading",
            75,
            classical("automated_color_grading", batch=4, iters=5),
        ),
        ("dcmcs3di", 90, deep("dcmcs3di", "dcmcs3di full-res", bench_dcmcs3di)),
        (
            "dcmcs3di bf16 recipe",
            75,
            deep(
                "dcmcs3di_bf16",
                "dcmcs3di full-res bf16 recipe",
                lambda: bench_dcmcs3di(compute_dtype="bfloat16"),
            ),
        ),
        ("dmsct", 90, deep("dmsct", "dmsct full-res", bench_dmsct)),
        (
            "dmsct bf16 recipe",
            75,
            deep(
                "dmsct_bf16_recipe",
                "dmsct full-res bf16 recipe",
                lambda: bench_dmsct(recipe=True),
            ),
        ),
        ("idt kernel integrity", 30, check_idt_kernel_integrity),
        ("local-corr kernel integrity", 45, check_local_corr_kernel_integrity),
        (
            "win-attention kernel integrity",
            60,
            check_win_attention_kernel_integrity,
        ),
        ("misc kernel integrity", 60, check_misc_kernel_integrity),
        ("predict CLI smoke", 90, check_predict_smoke),
        # Diagnostic A/B, least valuable for the record — last on purpose.
        (
            "dmsct bf16 recipe w/o fused kernels",
            75,
            deep(
                "dmsct_bf16_nofuse",
                "dmsct full-res bf16 recipe w/o fused kernels",
                lambda: bench_dmsct(recipe=True, fused_attention=False),
            ),
        ),
    ]
    for name, est, thunk in sections:
        if remaining() < est:
            print(
                f"[bench] BUDGET GUARD: {remaining():.0f}s left < {est}s "
                f"estimate — skipping '{name}'",
                file=sys.stderr,
            )
            continue
        sec_t0 = time.monotonic()
        try:
            thunk()
        except Exception as e:  # noqa: BLE001
            print(f"[bench] {name} failed: {e}", file=sys.stderr)
        print(
            f"[bench] -- section '{name}' took {time.monotonic() - sec_t0:.0f}s"
            f" ({remaining():.0f}s budget left)",
            file=sys.stderr,
        )
    print(
        f"[bench] done in {time.monotonic() - t0:.0f}s "
        f"(budget {budget:.0f}s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
