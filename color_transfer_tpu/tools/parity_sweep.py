"""One-command published-table parity sweep.

The day the reference's assets land (datasets + the W&B checkpoints
DCMCS3DI epoch=96-step=10185 / DMSCT epoch=72-step=7665, reference
demo.ipynb cells 24/26, README.md:69-70), this script converts the torch
checkpoints with the production converters, restores them, runs the full
artificial (x31 distortion grid, reference utils/data.py:12-22) +
real-world test sweeps, and emits a BASELINE.md-shaped markdown table
(reference README.md:74-83 / graphics/comparison.webp):

    python -m color_transfer_tpu.tools.parity_sweep \\
        --data_dir "Stereo Dataset Root" \\
        --dcmcs3di_ckpt "epoch=96-step=10185.ckpt" \\
        --dmsct_ckpt "epoch=72-step=7665.ckpt" \\
        --eval_buckets 64 --out parity_table.md

It is smoke-tested in CI on fabricated torch-layout checkpoints and the
synthetic mini dataset (tests/test_parity_sweep.py), so it runs unmodified
on real assets.
"""

import argparse
import json
from pathlib import Path

CLASSICAL = [
    ("Reinhard et al.", "reinhard"),
    ("Xiao et al.", "correlated_color_space"),
    ("Pitie et al. (linear MK)", "monge_kantorovitch"),
    ("Pitie et al. (iterative)", "automated_color_grading"),
]

# Published artificial-dataset table (reference graphics/comparison.webp,
# README.md:74-83) for side-by-side deltas when the real dataset is used.
PUBLISHED_ARTIFICIAL = {
    "Reinhard et al.": {"PSNR": 34.03, "SSIM": 0.960, "FSIM": 0.984, "iCID": 0.124},
    "Xiao et al.": {"PSNR": 33.11, "SSIM": 0.951, "FSIM": 0.982, "iCID": 0.161},
    "Pitie et al. (linear MK)": {"PSNR": 34.11, "SSIM": 0.958, "FSIM": 0.985, "iCID": 0.124},
    "Pitie et al. (iterative)": {"PSNR": 31.02, "SSIM": 0.949, "FSIM": 0.974, "iCID": 0.168},
    "Croci et al. (DCMCS3DI)": {"PSNR": 33.02, "SSIM": 0.979, "FSIM": 0.984, "iCID": 0.084},
    "Ours (DMSCT)": {"PSNR": 35.26, "SSIM": 0.988, "FSIM": 0.992, "iCID": 0.073},
}


def _load_torch_ckpt(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    return sd, ckpt.get("hyper_parameters", {}) or {}


def load_dcmcs3di(path):
    """Convert a reference DCMCS3DI Lightning checkpoint -> (module, params)."""
    from color_transfer_tpu.run.modules import DCMCS3DIModule
    from color_transfer_tpu.tools import convert_checkpoints as cc

    sd, hp = _load_torch_ckpt(path)
    module = DCMCS3DIModule(
        extraction_layers=hp.get("extraction_layers", 18),
        transfer_layers=hp.get("transfer_layers", 6),
        channels=hp.get("channels", 64),
    )
    params = cc.convert_dcmcs3di(
        sd,
        extraction_layers=hp.get("extraction_layers", 18),
        transfer_layers=hp.get("transfer_layers", 6),
    )
    return module, params


def load_dmsct(path, matcher_corr_dtype="float32"):
    """Convert a reference DMSCT Lightning checkpoint -> (module, variables).

    The Lightning state dict carries the frozen GMFlow matcher weights too,
    so no separate --gmflow_ckpt is needed for eval parity."""
    from color_transfer_tpu.run.modules import DMSCTModule
    from color_transfer_tpu.tools import convert_checkpoints as cc

    sd, hp = _load_torch_ckpt(path)
    module = DMSCTModule(
        encoder_name=hp.get("encoder_name", "efficientnet-b2"),
        encoder_depth=hp.get("encoder_depth", 4),
        decoder_channels=tuple(hp.get("decoder_channels", (256, 128, 64, 32))),
        # Real reference checkpoints carry no matcher hparams (the GMFlow
        # config is fixed, reference unimatch/__init__.py:18-27) — these
        # fall back to the reference defaults; the CI smoke test fabricates
        # tiny ones to keep CPU runtime sane.
        matcher_num_layers=hp.get("matcher_num_layers", 6),
        matcher_num_reg_refine=hp.get("matcher_num_reg_refine", 6),
        matcher_corr_dtype=matcher_corr_dtype,
    )
    params, batch_stats = cc.convert_dmsct(
        sd, decoder_channels=tuple(hp.get("decoder_channels", (256, 128, 64, 32)))
    )
    return module, {"params": params, "batch_stats": batch_stats}


def run_sweep(
    data_dir,
    dcmcs3di_ckpt=None,
    dmsct_ckpt=None,
    classical=True,
    eval_buckets=None,
    max_batches=None,
    batch_size=1,
    num_workers=4,
    log_dir="runs/parity_sweep",
    seed=42,
    matcher_corr_dtype="float32",
):
    """Returns {method_name: {"Test PSNR/dataloader_idx_0": ..., ...}}."""
    from color_transfer_tpu.run.datamodule import DataModule
    from color_transfer_tpu.run.modules import ClassicalModule
    from color_transfer_tpu.run.trainer import Trainer

    datamodule = DataModule(
        data_dir, batch_size=batch_size, num_workers=num_workers, seed=seed
    )
    results = {}

    def trainer_for(name):
        return Trainer(log_dir=str(Path(log_dir) / name), seed=seed)

    if classical:
        for label, spec in CLASSICAL:
            module = ClassicalModule(func_spec=spec, seed=seed)
            results[label] = trainer_for(spec).test(
                module, datamodule, max_batches=max_batches
            )

    if dcmcs3di_ckpt is not None:
        module, params = load_dcmcs3di(dcmcs3di_ckpt)
        results["Croci et al. (DCMCS3DI)"] = trainer_for("dcmcs3di").test(
            module, datamodule, params=params, max_batches=max_batches,
            eval_buckets=eval_buckets,
        )

    if dmsct_ckpt is not None:
        module, variables = load_dmsct(
            dmsct_ckpt, matcher_corr_dtype=matcher_corr_dtype
        )
        results["Ours (DMSCT)"] = trainer_for("dmsct").test(
            module, datamodule, params=variables, max_batches=max_batches,
        )

    return results


def format_table(results, published=None):
    """BASELINE.md-shaped markdown: one row per (method, dataset)."""
    metrics = ["PSNR", "SSIM", "FSIM", "iCID"]
    datasets = [("Artificial", 0), ("Real-World", 1)]
    lines = [
        "| Method | Dataset | " + " | ".join(metrics) + " | published PSNR |",
        "|---|---|" + "---|" * (len(metrics) + 1),
    ]
    for name, res in results.items():
        for ds_name, idx in datasets:
            vals = []
            found = False
            for m in metrics:
                v = res.get(f"Test {m}/dataloader_idx_{idx}")
                found |= v is not None
                vals.append("-" if v is None else f"{v:.3f}")
            if not found:
                continue
            pub = (published or {}).get(name, {}).get("PSNR")
            pub_s = f"{pub:.2f}" if (pub is not None and ds_name == "Artificial") else "-"
            lines.append(
                f"| {name} | {ds_name} | " + " | ".join(vals) + f" | {pub_s} |"
            )
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dcmcs3di_ckpt", default=None)
    parser.add_argument("--dmsct_ckpt", default=None)
    parser.add_argument("--no_classical", action="store_true")
    parser.add_argument("--eval_buckets", type=int, default=None)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--matcher_corr_dtype", default="float32",
                        help="float32 for bit-strict parity (default); "
                             "bfloat16 for speed after the drift is gated")
    parser.add_argument("--out", default=None, help="write the markdown table here")
    args = parser.parse_args(argv)

    results = run_sweep(
        args.data_dir,
        dcmcs3di_ckpt=args.dcmcs3di_ckpt,
        dmsct_ckpt=args.dmsct_ckpt,
        classical=not args.no_classical,
        eval_buckets=args.eval_buckets,
        max_batches=args.max_batches,
        num_workers=args.num_workers,
        matcher_corr_dtype=args.matcher_corr_dtype,
    )
    table = format_table(results, published=PUBLISHED_ARTIFICIAL)
    print(json.dumps(results, indent=2))
    print()
    print(table)
    if args.out:
        Path(args.out).write_text(table + "\n")
        print(f"\nwrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
