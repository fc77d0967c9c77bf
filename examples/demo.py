"""Demo — the reference demo.ipynb as a script.

Runs the five classical color-transfer methods on one stereopair with a
hue-shift distortion (+0.5, the notebook's distortion; reference demo.ipynb
cells 6-26) — plus the two deep correctors when checkpoint dirs are given —
and reports PSNR/SSIM/FSIM/iCID for each, plus optional output panels.

    python -m examples.demo --left path/_L.png --right path/_R.png \
        [--out demo_out/] [--dcmcs3di ckpt_dir] [--dmsct ckpt_dir]

Deep methods run full-resolution through the fused Pallas attention path on
TPU — no 0.75x downscale workaround (reference demo.ipynb cell 24).
"""

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from color_transfer_tpu import methods, metrics
from color_transfer_tpu.data import distortions
from color_transfer_tpu.data.native_loader import read_image


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--left", required=True, help="gt left view (*_L.png)")
    parser.add_argument("--right", required=True, help="reference right view")
    parser.add_argument("--hue", type=float, default=0.5)
    parser.add_argument("--out", default=None, help="directory for output PNGs")
    parser.add_argument("--dcmcs3di", default=None,
                        help="checkpoint dir: also run the DCMCS3DI corrector")
    parser.add_argument("--dmsct", default=None,
                        help="checkpoint dir: also run the DMSCT corrector")
    args = parser.parse_args(argv)

    gt = jnp.asarray(read_image(args.left), dtype=jnp.float32) / 255.0
    reference = jnp.asarray(read_image(args.right), dtype=jnp.float32) / 255.0
    target = distortions.adjust_hue(gt, args.hue)

    names = [
        "reinhard",
        "correlated_color_space",
        "monge_kantorovitch",
        "idt",
        "automated_color_grading",
    ]
    results = {"distorted input": target}
    for name in names:
        fn = methods.get_method(name)
        results[name] = jnp.clip(fn(target, reference), 0.0, 1.0)

    # Deep correctors at full resolution (reference demo.ipynb cells 24/26
    # downscale 0.75x to fit GPU memory; the Pallas attention path doesn't
    # need to). Checkpoints are optional — without one the flags are skipped.
    for name, ckpt in [("dcmcs3di", args.dcmcs3di), ("dmsct", args.dmsct)]:
        if ckpt is None:
            continue
        from color_transfer_tpu.methods.video import color_transfer_between_videos

        results[name] = color_transfer_between_videos(
            target[None], reference[None], method=name, ckpt_path=ckpt,
            batch_size=1,
        )[0]

    print(f"{'method':28s} {'PSNR':>7s} {'SSIM':>7s} {'FSIM':>7s} {'iCID':>7s}")
    for name, out in results.items():
        o = out[None]
        g = gt[None]
        print(
            f"{name:28s} {float(metrics.psnr(o, g)):7.2f}"
            f" {float(metrics.ssim(o, g)):7.4f}"
            f" {float(metrics.fsim(o, g)):7.4f}"
            f" {float(metrics.icid(o, g)):7.4f}"
        )

    if args.out:
        from PIL import Image

        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        for name, out in results.items():
            arr = np.clip(np.asarray(out) * 255, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(out_dir / f"{name.replace(' ', '_')}.png")
        print(f"wrote panels to {out_dir}")


if __name__ == "__main__":
    main()
