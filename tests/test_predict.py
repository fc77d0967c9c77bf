"""predict subcommand: correct stereo pairs from the CLI (run/predict.py)."""

import numpy as np
import yaml
from PIL import Image

from color_transfer_tpu.run.cli import main
from color_transfer_tpu.run.predict import collect_pairs


def _pair_dir(tmp_path, n=2, shape=(24, 32)):
    rng = np.random.default_rng(7)
    d = tmp_path / "pairs" / "scene1"
    d.mkdir(parents=True)
    for i in range(n):
        base = rng.integers(40, 215, (*shape, 3), dtype=np.uint8)
        Image.fromarray(base).save(d / f"{i:04d}_LD.png")  # distorted target
        Image.fromarray(
            np.clip(base.astype(int) - 25, 0, 255).astype(np.uint8)
        ).save(d / f"{i:04d}_L.png")  # gt (must NOT be picked over _LD)
        Image.fromarray(
            np.clip(base.astype(int) + 30, 0, 255).astype(np.uint8)
        ).save(d / f"{i:04d}_R.png")
    return tmp_path / "pairs"


def test_collect_pairs_prefers_distorted_target(tmp_path):
    root = _pair_dir(tmp_path)
    pairs = collect_pairs(root)
    assert len(pairs) == 2
    for target, ref, rel in pairs:
        assert target.name.endswith("_LD.png")
        assert ref.name.endswith("_R.png")
        assert str(rel).startswith("scene1")


def test_predict_model_overrides_reach_module(tmp_path):
    # Flat --model.X overrides (no config file) must reach the deep
    # module's constructor: an unknown kwarg must raise, not be silently
    # dropped (regression: predict discarded all model args whenever
    # --method was given).
    import pytest

    root = _pair_dir(tmp_path, n=1)
    argv = [
        "predict", "--method", "dcmcs3di",
        "--model.no_such_knob", "1",
        "--input_dir", str(root), "--output_dir", str(tmp_path / "out"),
    ]
    with pytest.raises(TypeError, match="no_such_knob"):
        main(argv)


def test_predict_deep_with_model_overrides(tmp_path):
    # A valid override (tiny model) runs end-to-end.
    root = _pair_dir(tmp_path, n=1)
    out_dir = tmp_path / "out"
    rc = main([
        "predict", "--method", "dcmcs3di",
        "--model.extraction_layers", "1", "--model.transfer_layers", "1",
        "--model.channels", "8", "--model.heavy_metrics", "false",
        "--input_dir", str(root), "--output_dir", str(out_dir),
    ])
    assert rc == 0
    assert len(sorted(out_dir.glob("**/*_C.png"))) == 1


def test_predict_directory_classical(tmp_path, capsys):
    root = _pair_dir(tmp_path)
    out_dir = tmp_path / "out"
    rc = main([
        "predict", "--method", "reinhard",
        "--input_dir", str(root), "--output_dir", str(out_dir),
    ])
    assert rc == 0
    outs = sorted(out_dir.glob("**/*_C.png"))
    assert len(outs) == 2
    corrected = np.asarray(Image.open(outs[0])).astype(np.float32)
    target = np.asarray(
        Image.open(root / "scene1" / "0000_LD.png")
    ).astype(np.float32)
    reference = np.asarray(
        Image.open(root / "scene1" / "0000_R.png")
    ).astype(np.float32)
    # Reinhard matches global statistics: the corrected mean moves from the
    # target's toward the reference's.
    assert abs(corrected.mean() - reference.mean()) < abs(
        target.mean() - reference.mean()
    )


def test_predict_single_pair_with_config_func_spec(tmp_path):
    root = _pair_dir(tmp_path, n=1)
    cfg = {
        "model": {
            "class_path": "classical",
            "init_args": {
                "func_spec": "methods.linear.color_transfer_between_images"
            },
        }
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = tmp_path / "single" / "corrected.png"
    rc = main([
        "predict", "--config", str(cfg_path),
        "--target", str(root / "scene1" / "0000_LD.png"),
        "--reference", str(root / "scene1" / "0000_R.png"),
        "--output", str(out),
    ])
    assert rc == 0
    assert out.exists()


def test_predict_deep_random_init(tmp_path):
    """Deep method without a checkpoint runs from init (like test does)."""
    root = _pair_dir(tmp_path, n=1)
    cfg = {
        "model": {
            "class_path": "dcmcs3di",
            "init_args": {
                "extraction_layers": 1,
                "transfer_layers": 1,
                "channels": 8,
                "heavy_metrics": False,
            },
        }
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "deep_out"
    rc = main([
        "predict", "--config", str(cfg_path),
        "--input_dir", str(root), "--output_dir", str(out_dir),
    ])
    assert rc == 0
    outs = sorted(out_dir.glob("**/*_C.png"))
    assert len(outs) == 1
    arr = np.asarray(Image.open(outs[0]))
    assert arr.shape == (24, 32, 3)


def test_predict_method_override_drops_config_init_args(tmp_path):
    """--method overriding the config's model class must not leak that
    class's init_args into the requested module."""
    root = _pair_dir(tmp_path, n=1)
    cfg = {
        "model": {
            "class_path": "dcmcs3di",
            "init_args": {"extraction_layers": 1, "transfer_layers": 1,
                          "channels": 8, "heavy_metrics": False},
        }
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "override_out"
    rc = main([
        "predict", "--config", str(cfg_path), "--method", "reinhard",
        "--input_dir", str(root), "--output_dir", str(out_dir),
    ])
    assert rc == 0
    assert len(sorted(out_dir.glob("**/*_C.png"))) == 1


def test_predict_classical_warns_on_ckpt_path(tmp_path, recwarn):
    root = _pair_dir(tmp_path, n=1)
    out_dir = tmp_path / "warn_out"
    rc = main([
        "predict", "--method", "reinhard", "--ckpt_path", "/nonexistent",
        "--input_dir", str(root), "--output_dir", str(out_dir),
    ])
    assert rc == 0
    assert any("ckpt_path ignored" in str(w.message) for w in recwarn.list)
