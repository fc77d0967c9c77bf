"""YAML config system with reference-compatible structure.

Accepts the reference's LightningCLI YAML shape (reference configs/*.yaml):

    seed_everything: 42
    model: {class_path: ..., init_args: {...}}
    data:  {class_path: ..., init_args: {data_dir: ..., ...}}
    trainer: {max_epochs: ..., logger: ..., callbacks: [...]}

plus dotted CLI overrides (``--model.init_args.channels 32``; the shorthand
``--model.func_spec X`` the reference README uses also works,
reference README.md:66). Reference class paths map onto this framework's
modules via run.modules.MODULE_REGISTRY.
"""

import copy

import yaml

from color_transfer_tpu.run.datamodule import DataModule
from color_transfer_tpu.run.modules import build_module
from color_transfer_tpu.run.trainer import Trainer

_TRAINER_KEYS = {"max_epochs", "log_every", "seed", "monitor", "use_wandb",
                 "val_every", "log_dir"}


def load_config(path=None, overrides=None):
    cfg = {}
    if path is not None:
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
    for dotted, value in (overrides or {}).items():
        _apply_override(cfg, dotted, value)
    return cfg


def _coerce(value):
    if not isinstance(value, str):
        return value
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def _apply_override(cfg, dotted, value):
    keys = dotted.lstrip("-").split(".")
    # LightningCLI shorthand: --model.X means --model.init_args.X when the
    # section uses class_path/init_args.
    node = cfg
    for i, k in enumerate(keys[:-1]):
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
        if (
            i == 0
            and "class_path" in node
            and keys[i + 1] not in ("class_path", "init_args")
        ):
            node = node.setdefault("init_args", {})
    node[keys[-1]] = _coerce(value)


def build_from_config(cfg, log_dir=None):
    """Instantiate (module, datamodule, trainer) from a config dict."""
    cfg = copy.deepcopy(cfg)

    # Multi-host runs configure `distributed:` (coordinator_address,
    # num_processes, process_id) or the JAX_* env vars; must run before any
    # mesh/device use (parallel/multihost.py).
    dist_cfg = cfg.get("distributed") or {}
    if dist_cfg:
        from color_transfer_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(**dist_cfg)

    model_cfg = cfg.get("model", {})
    module = build_module(
        model_cfg.get("class_path", "classical"),
        model_cfg.get("init_args", {}),
        seed=cfg.get("seed_everything", 42),
    )

    data_cfg = cfg.get("data", {})
    data_args = dict(data_cfg.get("init_args", data_cfg if "class_path" not in data_cfg else {}))
    # Accept the reference's knob name in both config shapes (nested
    # init_args and flat).
    num_workers = data_args.pop("num_workers", None)
    if num_workers is not None:
        data_args["num_workers"] = max(1, int(num_workers))
    datamodule = DataModule(**data_args) if data_args.get("data_dir") else None

    trainer_cfg = dict(cfg.get("trainer", {}))
    seed = cfg.get("seed_everything", 42)
    logger_cfg = trainer_cfg.pop("logger", None)
    use_wandb = bool(logger_cfg) and logger_cfg not in (False, "false", "False")
    callbacks = trainer_cfg.pop("callbacks", [])
    monitor = "Validation PSNR/dataloader_idx_0"
    for cb in callbacks or []:
        args = (cb or {}).get("init_args", {})
        if "monitor" in args:
            monitor = args["monitor"]

    kwargs = {k: v for k, v in trainer_cfg.items() if k in _TRAINER_KEYS}
    kwargs.setdefault("seed", seed)
    kwargs["use_wandb"] = use_wandb
    kwargs["monitor"] = monitor
    if log_dir is not None:
        kwargs["log_dir"] = log_dir
    trainer = Trainer(**kwargs)
    return module, datamodule, trainer
