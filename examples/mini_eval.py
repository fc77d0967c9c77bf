"""Mini parity evaluation — the full 31-distortion artificial-test protocol
(reference utils/data.py:12-22,:87-106) on one stereopair.

Without the full InStereo2K-derived dataset this cannot reproduce the
published table's absolute numbers (BASELINE.md), but the *relative ordering*
of the classical methods across the same distortion grid is a meaningful
parity check: published artificial-PSNR order is
MK (34.11) > Reinhard (34.03) > Xiao (33.11) > IDT/grading (31.02).

    python -m examples.mini_eval --left 0964_L.png --right 0964_R.png
"""

import argparse
import json

import jax
import jax.numpy as jnp

from color_transfer_tpu import methods, metrics
from color_transfer_tpu.data import distortions
from color_transfer_tpu.data.native_loader import read_image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--left", required=True)
    parser.add_argument("--right", required=True)
    parser.add_argument("--downscale", type=int, default=1,
                        help="integer downscale for speed")
    args = parser.parse_args()

    gt = jnp.asarray(read_image(args.left), dtype=jnp.float32) / 255.0
    reference = jnp.asarray(read_image(args.right), dtype=jnp.float32) / 255.0
    if args.downscale > 1:
        gt = gt[:: args.downscale, :: args.downscale]
        reference = reference[:: args.downscale, :: args.downscale]

    grid = distortions.setup_grid_distortions()
    names = ["reinhard", "correlated_color_space", "monge_kantorovitch",
             "idt", "automated_color_grading"]

    fns = {name: jax.jit(methods.get_method(name)) for name in names}
    psnr = jax.jit(metrics.psnr)
    ssim = jax.jit(metrics.ssim)
    icid = jax.jit(metrics.icid)

    sums = {name: {"PSNR": 0.0, "SSIM": 0.0, "iCID": 0.0} for name in names}
    for dist_fn in grid:
        target = dist_fn(gt)
        for name in names:
            out = jnp.clip(fns[name](target, reference), 0.0, 1.0)[None]
            g = gt[None]
            sums[name]["PSNR"] += float(psnr(out, g))
            sums[name]["SSIM"] += float(ssim(out, g))
            sums[name]["iCID"] += float(icid(out, g))

    n = len(grid)
    results = {
        name: {k: round(v / n, 4) for k, v in vals.items()}
        for name, vals in sums.items()
    }
    print(json.dumps(results, indent=2))
    order = sorted(results, key=lambda nm: -results[nm]["PSNR"])
    print("PSNR ordering:", " > ".join(order))


if __name__ == "__main__":
    main()
