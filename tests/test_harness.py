"""End-to-end harness tests: config -> fit -> checkpoint -> test sweep,
on a tiny synthetic dataset over the 8-device CPU mesh."""

import json

import numpy as np
import pytest
import yaml
from PIL import Image

import jax.numpy as jnp

from color_transfer_tpu.run.config import load_config, build_from_config
from color_transfer_tpu.run.datamodule import DataModule


@pytest.fixture
def data_root(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in [("Train", 4), ("Validation", 2), ("Test", 2)]:
        d = tmp_path / "data" / split
        d.mkdir(parents=True)
        for i in range(n):
            base = rng.integers(40, 215, (48, 64, 3), dtype=np.uint8)
            shift = rng.integers(-10, 10, (1, 1, 3))
            Image.fromarray(base).save(d / f"{i:04d}_L.png")
            Image.fromarray(
                np.clip(base.astype(int) + shift, 0, 255).astype(np.uint8)
            ).save(d / f"{i:04d}_R.png")
    rw = tmp_path / "data" / "Real-World Test" / "scene0"
    rw.mkdir(parents=True)
    base = rng.integers(40, 215, (48, 64, 3), dtype=np.uint8)
    for suffix in ["L", "LD", "R"]:
        Image.fromarray(
            np.clip(base.astype(int) + rng.integers(-8, 8, (1, 1, 3)), 0, 255).astype(
                np.uint8
            )
        ).save(rw / f"0000_{suffix}.png")
    return tmp_path / "data"


def _write_config(tmp_path, data_root, extra_model=None):
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
                "crop_size": [16, 32],
                "image_repeats": 2,
                "batch_size": 8,
                "num_workers": 2,
            }
        },
        "trainer": {
            "max_epochs": 1,
            "log_every": 1,
            "log_dir": str(tmp_path / "run"),
        },
    }
    if extra_model:
        cfg["model"] = extra_model
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


class TestConfig:
    def test_overrides(self, tmp_path, data_root):
        path = _write_config(tmp_path, data_root)
        cfg = load_config(path, {"model.channels": "16", "trainer.max_epochs": "3"})
        assert cfg["model"]["init_args"]["channels"] == 16
        assert cfg["trainer"]["max_epochs"] == 3

    def test_reference_class_path(self, tmp_path, data_root):
        path = _write_config(
            tmp_path,
            data_root,
            extra_model={
                "class_path": "methods.Runner",
                "init_args": {"func_spec": "methods.linear.color_transfer_between_images"},
            },
        )
        module, dm, trainer = build_from_config(load_config(path))
        assert module.name == "classical"


class TestFit:
    def test_one_epoch_and_checkpoint(self, tmp_path, data_root):
        path = _write_config(tmp_path, data_root)
        cfg = load_config(path)
        module, dm, trainer = build_from_config(cfg)
        state = trainer.fit(module, dm)
        assert int(state.step) == 1  # 4 imgs * 2 repeats / batch 8 = 1 step

        ckpt_dir = trainer.ckpt.ckpt_dir
        assert (ckpt_dir / "last").exists()
        assert (ckpt_dir / "best").exists()
        assert trainer.ckpt.best_score is not None

        # Metrics were logged with reference-style names.
        lines = [
            json.loads(line)
            for line in (trainer.log_dir / "metrics.jsonl").read_text().splitlines()
        ]
        keys = set().union(*[set(rec) for rec in lines])
        assert "Training PSNR" in keys
        assert "Validation PSNR/dataloader_idx_0" in keys
        assert "Validation PSNR/dataloader_idx_1" in keys  # real-world loader


class TestTestSweep:
    def test_classical_sweep(self, tmp_path, data_root):
        path = _write_config(
            tmp_path,
            data_root,
            extra_model={
                "class_path": "classical",
                "init_args": {"func_spec": "reinhard"},
            },
        )
        cfg = load_config(path)
        module, dm, trainer = build_from_config(cfg)
        results = trainer.test(module, dm, max_batches=3)
        assert "Test PSNR/dataloader_idx_0" in results
        assert "Test PSNR/dataloader_idx_1" in results
        assert results["Test PSNR/dataloader_idx_0"] > 15
        assert 0 <= results["Test iCID/dataloader_idx_0"] <= 1


class TestMetricLogger:
    def test_log_image_writes_pngs(self, tmp_path, rng):
        from color_transfer_tpu.run.logging import MetricLogger

        logger = MetricLogger(tmp_path / "logs")
        imgs = [rng.uniform(0, 1, (8, 10, 3)).astype(np.float32) for _ in range(2)]
        logger.log_image("Panel/Test", imgs, caption=["a", "b"], step=3)
        files = sorted((tmp_path / "logs" / "images").glob("*.png"))
        assert len(files) == 2
        logger.close()
