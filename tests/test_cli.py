"""CLI end-to-end: fit -> checkpoint -> test with --ckpt_path restore."""

import json

import numpy as np
import yaml
from PIL import Image

from color_transfer_tpu.run.cli import main


def _make_data(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in [("Train", 3), ("Validation", 2), ("Test", 1)]:
        d = tmp_path / "data" / split
        d.mkdir(parents=True)
        for i in range(n):
            base = rng.integers(40, 215, (40, 56, 3), dtype=np.uint8)
            Image.fromarray(base).save(d / f"{i:04d}_L.png")
            Image.fromarray(
                np.clip(base.astype(int) + 8, 0, 255).astype(np.uint8)
            ).save(d / f"{i:04d}_R.png")
    return tmp_path / "data"


def _config(tmp_path, data_root):
    cfg = {
        "seed_everything": 42,
        "model": {
            "class_path": "dcmcs3di",
            "init_args": {
                "extraction_layers": 1,
                "transfer_layers": 1,
                "channels": 8,
                "heavy_metrics": False,
            },
        },
        "data": {
            "init_args": {
                "data_dir": str(data_root),
                "crop_size": [16, 24],
                "image_repeats": 3,
                "batch_size": 8,
                "num_workers": 2,
            }
        },
        "trainer": {"max_epochs": 1, "log_every": 1, "log_dir": str(tmp_path / "run")},
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


class TestCLI:
    def test_fit_then_test_with_checkpoint(self, tmp_path, capsys):
        data_root = _make_data(tmp_path)
        cfg = _config(tmp_path, data_root)

        assert main(["fit", "--config", str(cfg)]) == 0
        ckpt = tmp_path / "run" / "checkpoints" / "best"
        assert ckpt.exists()

        assert (
            main(
                [
                    "test",
                    "--config",
                    str(cfg),
                    "--ckpt_path",
                    str(ckpt),
                    "--max_batches",
                    "2",
                ]
            )
            == 0
        )
        out = capsys.readouterr().out
        results = json.loads(out[out.index("{"):])
        assert "Test PSNR/dataloader_idx_0" in results

        # Checkpoint saves are registered as run artifacts (the reference's
        # WandbLogger(log_model=true), configs/dcmcs3di.yaml:22): offline
        # they appear as JSONL events with alias + path.
        events = [
            json.loads(line)
            for line in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
        ]
        aliases = {e.get("alias") for e in events if "checkpoint" in e}
        assert {"best", "last"} <= aliases

        # predict serves corrected PNGs from the same checkpoint (restore
        # target built from a small-crop init — run/checkpoint.py).
        out_dir = tmp_path / "pred"
        assert (
            main(
                [
                    "predict",
                    "--config",
                    str(cfg),
                    "--ckpt_path",
                    str(ckpt),
                    "--input_dir",
                    str(data_root / "Test"),
                    "--output_dir",
                    str(out_dir),
                ]
            )
            == 0
        )
        assert (out_dir / "0000_C.png").exists()

    def test_classical_test_with_func_spec_override(self, tmp_path, capsys):
        data_root = _make_data(tmp_path)
        cfg_path = tmp_path / "others.yaml"
        cfg_path.write_text(
            yaml.safe_dump(
                {
                    "model": {"class_path": "classical", "init_args": {"func_spec": "reinhard"}},
                    "data": {"init_args": {"data_dir": str(data_root), "num_workers": 2}},
                    "trainer": {"log_dir": str(tmp_path / "run2")},
                }
            )
        )
        rc = main(
            [
                "test",
                "--config",
                str(cfg_path),
                "--model.func_spec",
                "methods.linear.monge_kantorovitch_color_transfer",
                "--max_batches",
                "2",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        results = json.loads(out[out.index("{"):])
        assert results["Test PSNR/dataloader_idx_0"] > 15

    def test_validate_subcommand(self, tmp_path, capsys):
        data_root = _make_data(tmp_path)
        cfg = _config(tmp_path, data_root)
        assert main(["validate", "--config", str(cfg), "--max_batches", "1"]) == 0
        out = capsys.readouterr().out
        results = json.loads(out[out.index("{"):])
        assert any(k.startswith("Validation PSNR") for k in results)
