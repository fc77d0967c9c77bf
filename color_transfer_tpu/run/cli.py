"""fit/test CLI — the reference's entry point semantics
(reference README.md:58-71, utils/cli.py):

    python -m color_transfer_tpu.cli fit  --config configs/dcmcs3di.yaml
    python -m color_transfer_tpu.cli test --config configs/others.yaml \
        --model.func_spec methods.linear.color_transfer_between_images
    python -m color_transfer_tpu.cli test --config configs/dcmcs3di.yaml \
        --ckpt_path runs/dcmcs3di/checkpoints/best --trainer.logger false

plus a serving subcommand the reference lacks (run/predict.py):

    python -m color_transfer_tpu.cli predict --method dmsct \
        --ckpt_path runs/dmsct/checkpoints/best \
        --input_dir "Real-World Dataset/Test" --output_dir corrected/
"""

import argparse
import json
import sys

from color_transfer_tpu.run.config import load_config, build_from_config


def _parse(argv):
    parser = argparse.ArgumentParser(prog="color_transfer_tpu.cli")
    parser.add_argument(
        "subcommand", choices=["fit", "test", "validate", "predict"]
    )
    parser.add_argument("--config", default=None)
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--log_dir", default=None)
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument(
        "--eval_buckets", type=int, default=None,
        help="pad eval shapes to this multiple: O(buckets) compiles for "
             "mixed-shape sweeps (run/bucketing.py)",
    )
    # predict-only arguments (run/predict.py)
    parser.add_argument("--method", default=None,
                        help="predict: registry/deep method name (defaults "
                             "to the config's model class_path)")
    parser.add_argument("--target", default=None)
    parser.add_argument("--reference", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--input_dir", default=None)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="frames per device program; default is "
                             "method-aware (run/predict.py)")
    parser.add_argument("--allow_ungated", action="store_true",
                        help="acknowledge serving a recipe whose recorded "
                             "quality-gate verdict is FAIL (methods/gates.py)")
    args, unknown = parser.parse_known_args(argv)

    overrides = {}
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if tok.startswith("--"):
            if "=" in tok:
                k, v = tok[2:].split("=", 1)
                overrides[k] = v
                i += 1
            elif i + 1 < len(unknown):
                overrides[tok[2:]] = unknown[i + 1]
                i += 2
            else:
                overrides[tok[2:]] = "true"
                i += 1
        else:
            raise SystemExit(f"unexpected argument: {tok}")
    return args, overrides


def main(argv=None):
    args, overrides = _parse(argv if argv is not None else sys.argv[1:])
    cfg = load_config(args.config, overrides)

    if args.subcommand == "predict":
        # Serving path: no datamodule/trainer needed. Method comes from
        # --method or the config's model section (class_path, or the
        # classical func_spec knob).
        from color_transfer_tpu.run.predict import run_predict

        model_cfg = cfg.get("model", {}) or {}
        class_path = model_cfg.get("class_path")
        init_args = dict(model_cfg.get("init_args", {}))
        # --model.X without a config file (no class_path) lands FLAT in the
        # model section rather than under init_args — fold those in so
        # command-line model knobs reach the module either way.
        flat_args = {
            k: v for k, v in model_cfg.items()
            if k not in ("class_path", "init_args")
        }
        if args.method is None:
            init_args.update(flat_args)
            if class_path in (None, "classical"):
                args.method = init_args.pop("func_spec", None) or (
                    "monge_kantorovitch"
                )
            else:
                args.method = class_path
        elif args.method != class_path:
            # --method overrides the config's model: the config's
            # init_args are constructor kwargs for a DIFFERENT class and
            # must not leak into the requested module; flat command-line
            # model args still apply.
            init_args = flat_args
        else:
            init_args.update(flat_args)
        deep = args.method in ("dcmcs3di", "dmsct")
        return run_predict(args, init_args if deep else None)

    module, datamodule, trainer = build_from_config(cfg, log_dir=args.log_dir)

    if datamodule is None:
        raise SystemExit("config must provide data.init_args.data_dir")

    if args.subcommand == "fit":
        trainer.fit(module, datamodule, resume=args.ckpt_path)
        return 0

    params = None
    if args.ckpt_path is not None:
        from color_transfer_tpu.run.checkpoint import restore_eval_variables

        sample = None
        for loader in datamodule.test_loaders():
            from color_transfer_tpu.run.datamodule import to_float
            import jax.numpy as jnp

            batch = to_float(loader.first_batch())
            sample = {
                k: jnp.asarray(v) for k, v in batch.items() if k != "distortion_idx"
            }
            if "target" not in sample:
                sample["target"] = sample["gt"]
            break
        params = restore_eval_variables(module, args.ckpt_path, sample)
        if params is None:
            # Parameterless module (classical): nothing to restore into.
            import warnings

            warnings.warn(
                f"--ckpt_path ignored: module '{module.name}' is "
                "parameterless",
                stacklevel=1,
            )

    if args.subcommand == "validate":
        # Run the validation loaders against a restored (or fresh) state.
        import jax as _jax

        sample_loader = datamodule.val_loaders()[0]
        from color_transfer_tpu.run.datamodule import to_float
        import jax.numpy as _jnp

        batch = to_float(sample_loader.first_batch())
        sample = {k: _jnp.asarray(v) for k, v in batch.items()}
        if "target" not in sample:
            sample["target"] = sample["gt"]
        state = module.init_state(_jax.random.PRNGKey(0), sample)
        if params is not None and state is not None:
            if isinstance(params, dict) and "params" in params:
                replacements = {"params": params["params"]}
                if hasattr(state, "batch_stats"):
                    replacements["batch_stats"] = params["batch_stats"]
                state = state.replace(**replacements)
            else:
                state = state.replace(params=params)
        results = trainer.validate(
            module, datamodule, state, step=0, max_batches=args.max_batches
        )
        print(json.dumps(results, indent=2))
        return 0

    results = trainer.test(
        module, datamodule, params=params, max_batches=args.max_batches,
        eval_buckets=args.eval_buckets,
    )
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
