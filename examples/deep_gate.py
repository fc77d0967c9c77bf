"""Numeric-drift gate for the deep-model throughput recipes.

Runs DMSCT and DCMCS3DI twice on identical weights and inputs — once with
the bit-strict f32 defaults and once with an opt-in recipe (bf16 compute
dtypes and/or the fused Pallas windowed attention) — over the reference's
31-distortion test grid (reference utils/data.py:12-22), and reports the
drift between the two outputs: max|delta| and PSNR(recipe, f32) per
distortion, plus the delta of each quality metric computed against the
clean plate.

This is the recipe gate VERDICT round-2 item #3 asked for: a recipe is
admissible when the quality-metric delta stays under 0.05 dB PSNR
(|dSSIM| < 5e-4, |diCID| < 5e-4) across the whole grid.  Weights are a
fixed-seed random init (the published checkpoints cannot be downloaded in
this environment), which is the *harder* case for drift: an untrained
corrector's residual is high-frequency noise with no smoothness prior, so
rounding differences do not cancel.

    python -m examples.deep_gate --model dmsct --recipe bf16
    python -m examples.deep_gate --model dmsct --recipe fused
    python -m examples.deep_gate --model dmsct --recipe bf16+fused
    python -m examples.deep_gate --model dcmcs3di --recipe bf16
    # optional real stereopair instead of the synthetic one:
    python -m examples.deep_gate --left 0964_L.png --right 0964_R.png ...
"""

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu import metrics
from color_transfer_tpu.data import distortions


def build_model(name, recipe):
    bf16 = "bf16" in recipe
    fused = "fused" in recipe
    nofuse = "nofuse" in recipe
    if name == "dmsct":
        from color_transfer_tpu.models.dmsct import DMSCT

        kwargs = {}
        if recipe.startswith("bf16c"):
            # Corrector-only bf16: matcher stays bit-strict f32.
            kwargs.update(corrector_compute_dtype="bfloat16")
        elif recipe.startswith("bf16m"):
            # Matcher-only bf16: isolates the matcher's drift contribution.
            kwargs.update(
                matcher_corr_dtype="bfloat16",
                matcher_compute_dtype="bfloat16",
            )
        elif bf16:
            kwargs.update(
                matcher_corr_dtype="bfloat16",
                matcher_compute_dtype="bfloat16",
                corrector_compute_dtype="bfloat16",
            )
        if "refine32" in recipe:
            # Selective recipe: flow arithmetic (correlation expectations,
            # self-attn propagation, GRU loop incl. local corr) pinned f32;
            # bf16 stays confined to backbone/transformer/corrector.
            kwargs["matcher_refine_dtype"] = "float32"
        if fused:
            kwargs["matcher_fused_attention"] = True
        if nofuse:
            # bf16-nofuse isolates the dtype recipe from the fused kernels
            # ("auto" would otherwise route bf16 through them).
            kwargs["matcher_fused_attention"] = False
        model = DMSCT(**kwargs)
        fwd = jax.jit(lambda p, t, r: model.apply(p, t, r))
        return model, fwd
    if name == "dcmcs3di":
        from color_transfer_tpu.models.dcmcs3di import DCMCS3DI

        if fused:
            raise SystemExit("fused recipe applies to the DMSCT matcher only")
        kwargs = {"compute_dtype": jnp.bfloat16} if bf16 else {}
        model = DCMCS3DI(**kwargs)
        fwd = jax.jit(
            lambda p, t, r: model.apply(p, t, r, inference=True,
                                        use_pallas=True)[0]
        )
        return model, fwd
    raise SystemExit(f"unknown model {name!r}")


def init_params(name, model, h, w):
    # Both variants share one param tree (the recipe knobs change apply-time
    # compute dtypes / kernel routing only, never the tree), so a single
    # fixed-seed init feeds both paths.
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    probe_h, probe_w = min(64, h), min(64, w)
    dummy = jnp.zeros((1, probe_h, probe_w, 3), jnp.float32)
    if name == "dmsct":
        return jax.jit(model.init)(rngs, dummy, dummy)
    return jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)


def load_pair(args):
    if args.left and args.right:
        from color_transfer_tpu.data.native_loader import read_image

        gt = jnp.asarray(read_image(args.left), jnp.float32) / 255.0
        ref = jnp.asarray(read_image(args.right), jnp.float32) / 255.0
        if args.downscale > 1:
            gt = gt[:: args.downscale, :: args.downscale]
            ref = ref[:: args.downscale, :: args.downscale]
        return gt, ref
    # Synthetic stereopair: a smooth plate plus texture, with the "right"
    # view a small horizontal shift of the left (disparity ~8 px).
    h, w = args.height, args.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.5 + 0.4 * np.sin(xx / 37.0) * np.cos(yy / 29.0),
            0.5 + 0.3 * np.cos(xx / 23.0 + yy / 41.0),
            0.5 + 0.35 * np.sin((xx + yy) / 53.0),
        ],
        axis=-1,
    )
    rng = np.random.default_rng(3)
    base = np.clip(base + 0.05 * rng.standard_normal(base.shape), 0, 1)
    gt = jnp.asarray(base, jnp.float32)
    ref = jnp.roll(gt, 8, axis=1)
    return gt, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dmsct",
                    choices=["dmsct", "dcmcs3di"])
    ap.add_argument("--recipe", default="bf16",
                    help="bf16 | fused | bf16+fused")
    ap.add_argument("--left")
    ap.add_argument("--right")
    ap.add_argument("--downscale", type=int, default=1)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--gate_db", type=float, default=0.05,
                    help="max admissible |PSNR-vs-gt delta| in dB")
    ap.add_argument("--limit", type=int, default=0,
                    help="only run the first N grid distortions (0 = all 31)")
    args = ap.parse_args()

    gt, ref = load_pair(args)
    h, w = gt.shape[:2]
    print(f"[gate] {args.model} recipe={args.recipe} input {h}x{w}",
          flush=True)

    base_model, base_fwd = build_model(args.model, "")
    rec_model, rec_fwd = build_model(args.model, args.recipe)
    params = init_params(args.model, base_model, h, w)

    psnr = jax.jit(metrics.psnr)
    ssim = jax.jit(metrics.ssim)
    icid = jax.jit(metrics.icid)

    grid = distortions.setup_grid_distortions()
    if args.limit:
        grid = grid[: args.limit]
    rows = []
    worst = {"max_abs": 0.0, "pair_psnr": np.inf, "d_psnr": 0.0,
             "d_ssim": 0.0, "d_icid": 0.0}
    g4 = gt[None]
    r4 = ref[None]
    for i, dist_fn in enumerate(grid):
        t4 = jnp.clip(dist_fn(gt), 0.0, 1.0)[None]
        out_f32 = jnp.clip(base_fwd(params, t4, r4), 0.0, 1.0)
        out_rec = jnp.clip(rec_fwd(params, t4, r4), 0.0, 1.0)
        max_abs = float(jnp.abs(out_rec - out_f32).max())
        pair_psnr = float(psnr(out_rec.astype(jnp.float32), out_f32))
        d_psnr = float(psnr(out_rec.astype(jnp.float32), g4)) - float(
            psnr(out_f32, g4))
        d_ssim = float(ssim(out_rec.astype(jnp.float32), g4)) - float(
            ssim(out_f32, g4))
        d_icid = float(icid(out_rec.astype(jnp.float32), g4)) - float(
            icid(out_f32, g4))
        rows.append(dict(i=i, max_abs=max_abs, pair_psnr=pair_psnr,
                         d_psnr=d_psnr, d_ssim=d_ssim, d_icid=d_icid))
        worst["max_abs"] = max(worst["max_abs"], max_abs)
        worst["pair_psnr"] = min(worst["pair_psnr"], pair_psnr)
        for k in ("d_psnr", "d_ssim", "d_icid"):
            if abs(rows[-1][k]) > abs(worst[k]):
                worst[k] = rows[-1][k]
    summary = {
        "model": args.model,
        "recipe": args.recipe,
        "n_distortions": len(grid),
        "worst_max_abs": round(worst["max_abs"], 6),
        "worst_pair_psnr_db": round(worst["pair_psnr"], 2),
        "worst_d_psnr_db": round(worst["d_psnr"], 4),
        "worst_d_ssim": round(worst["d_ssim"], 6),
        "worst_d_icid": round(worst["d_icid"], 6),
        "gate_db": args.gate_db,
        "pass": bool(abs(worst["d_psnr"]) < args.gate_db
                     and abs(worst["d_ssim"]) < 5e-4
                     and abs(worst["d_icid"]) < 5e-4),
    }
    print(json.dumps(summary))
    if not summary["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()


