"""Batch prediction — correct stereo pairs from the CLI.

The reference exposes inference only through the metric harness (``test``)
or hand-written notebook code (reference demo.ipynb cells 11-26); correcting
actual images requires writing Python. This surface closes that gap:

    python -m color_transfer_tpu.cli predict --method monge_kantorovitch \
        --target T.png --reference R.png --output OUT.png
    python -m color_transfer_tpu.cli predict --method dmsct \
        --ckpt_path runs/dmsct/checkpoints/best \
        --input_dir "Real-World Dataset/Test" --output_dir corrected/

Directory mode walks the dataset layout the reference defines
(reference utils/data.py:54-55,:109-125): the corrected view is ``*_LD.*``
(the real-world distorted target) when present, else ``*_L.*``; the
reference view is the matching ``*_R.*``. Same-shape pairs are batched into
one sharded device program via methods/video.py, so a directory of frames
serves exactly like a video clip (one compile per distinct shape).
"""

from pathlib import Path

import numpy as np


def _read_float(path):
    from color_transfer_tpu.data.native_loader import read_image

    return read_image(path).astype(np.float32) / 255.0


def _write_png(path, img):
    from PIL import Image

    arr = np.asarray(np.clip(img, 0.0, 1.0) * 255.0 + 0.5, dtype=np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def collect_pairs(input_dir):
    """(target, reference, relative output stem) triples from a dataset-layout
    directory; recurses one scene level like RealWorldTestDataset
    (reference utils/data.py:120-125)."""
    input_dir = Path(input_dir)
    pairs = []
    for ref in sorted(input_dir.glob("**/*_R.*")):
        stem = ref.name[: -len("_R" + ref.suffix)]
        distorted = sorted(ref.parent.glob(f"{stem}_LD.*"))
        left = sorted(ref.parent.glob(f"{stem}_L.*"))
        target = distorted[0] if distorted else (left[0] if left else None)
        if target is None:
            continue
        rel = ref.parent.relative_to(input_dir) / f"{stem}_C.png"
        pairs.append((target, ref, rel))
    return pairs


def predict_pairs(
    pairs,
    output_dir,
    method="monge_kantorovitch",
    ckpt_path=None,
    module_kwargs=None,
    batch_size=None,
    mesh=None,
    allow_ungated=False,
):
    """Correct (target_path, reference_path, out_rel) triples into output_dir.

    Pairs are grouped by image shape; each group runs as one batched/sharded
    program through color_transfer_between_videos. Returns the written paths.

    batch_size=None picks a method-aware default: one frame per device for
    the deep correctors (a full-res 1080p frame nearly fills a chip's HBM;
    PERF.md measured per-chip batch>1 slower at full res anyway), 8 per
    device for the lightweight classical methods.
    """
    import jax

    from color_transfer_tpu.methods.video import (
        DEEP_METHODS,
        _build_deep,
        color_transfer_between_videos,
    )

    n_dev = mesh.devices.size if mesh is not None else jax.device_count()
    if batch_size is None:
        batch_size = n_dev if method in DEEP_METHODS else 8 * n_dev

    output_dir = Path(output_dir)
    groups = {}
    for target, ref, rel in pairs:
        t = _read_float(target)
        r = _read_float(ref)
        if t.shape != r.shape:
            raise ValueError(
                f"target/reference shape mismatch for {rel}: "
                f"{t.shape} vs {r.shape}"
            )
        groups.setdefault(t.shape, []).append((t, r, rel))

    # Deep methods: build the module and restore the checkpoint ONCE (param
    # shapes are resolution-independent), not per shape group — the shared
    # module instance also keeps eval jit caches warm across groups.
    module = variables = None
    if method in DEEP_METHODS and groups:
        from color_transfer_tpu.methods.gates import check_recipe

        check_recipe(method, module_kwargs, allow_ungated=allow_ungated)
        import jax.numpy as jnp

        t0, r0, _ = next(iter(groups.values()))[0]
        sample = {
            "target": jnp.asarray(t0[None]),
            "reference": jnp.asarray(r0[None]),
            "gt": jnp.asarray(t0[None]),
        }
        module, variables = _build_deep(
            method, ckpt_path, None, None, module_kwargs, sample
        )

    written = []
    for shape, items in groups.items():
        t_stack = np.stack([t for t, _, _ in items])
        r_stack = np.stack([r for _, r, _ in items])
        out = color_transfer_between_videos(
            t_stack,
            r_stack,
            method=method,
            batch_size=batch_size,
            mesh=mesh,
            module=module,
            variables=variables,
            module_kwargs=module_kwargs,
            allow_ungated=allow_ungated,
        )
        out = np.asarray(out)
        for i, (_, _, rel) in enumerate(items):
            path = output_dir / rel
            _write_png(path, out[i])
            written.append(path)
    return written


def run_predict(args, model_init_args=None):
    """CLI driver. Single-pair mode (--target/--reference/--output) or
    directory mode (--input_dir/--output_dir)."""
    module_kwargs = dict(model_init_args or {})

    if args.ckpt_path and args.method not in ("dcmcs3di", "dmsct"):
        import warnings

        warnings.warn(
            f"--ckpt_path ignored: method '{args.method}' is parameterless",
            stacklevel=1,
        )

    if args.target or args.reference or args.output:
        if not (args.target and args.reference and args.output):
            raise SystemExit(
                "single-pair mode needs --target, --reference and --output"
            )
        out = Path(args.output)
        pairs = [(Path(args.target), Path(args.reference), Path(out.name))]
        written = predict_pairs(
            pairs,
            out.parent,
            method=args.method,
            ckpt_path=args.ckpt_path,
            module_kwargs=module_kwargs,
            batch_size=args.batch_size,
            allow_ungated=getattr(args, "allow_ungated", False),
        )
    else:
        if not (args.input_dir and args.output_dir):
            raise SystemExit(
                "predict needs --target/--reference/--output or "
                "--input_dir/--output_dir"
            )
        pairs = collect_pairs(args.input_dir)
        if not pairs:
            raise SystemExit(
                f"no *_R.* / *_L(D).* pairs found under {args.input_dir}"
            )
        written = predict_pairs(
            pairs,
            args.output_dir,
            method=args.method,
            ckpt_path=args.ckpt_path,
            module_kwargs=module_kwargs,
            batch_size=args.batch_size,
            allow_ungated=getattr(args, "allow_ungated", False),
        )
    for path in written:
        print(path)
    return 0
