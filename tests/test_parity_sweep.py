"""End-to-end smoke test of the parity sweep on fabricated torch-layout
checkpoints + the synthetic mini dataset — so the day the reference's real
assets land, tools/parity_sweep.py runs unmodified (VERDICT r2 item #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from color_transfer_tpu.tools import parity_sweep
from tests.test_cli import _make_data
from tests.test_convert_checkpoints import _fabricate_smp_b2_state_dict


def _save_dcmcs3di_ckpt(path, channels=8, extraction_layers=2, transfer_layers=1):
    rs = np.random.default_rng(3)
    sd = {}

    def conv(key, i, o, k):
        sd[f"{key}.weight"] = rs.normal(scale=0.05, size=(o, i, k, k)).astype(
            np.float32
        )
        sd[f"{key}.bias"] = np.zeros(o, dtype=np.float32)

    def resb(key, ch):
        conv(f"{key}.body.0", ch, ch, 3)
        conv(f"{key}.body.2", ch, ch, 3)

    c = channels
    conv("extraction.0", 3, c, 3)
    for i in range(extraction_layers):
        resb(f"extraction.{i + 1}", c)
    resb("matcher.head", c)
    conv("matcher.query", c, c, 1)
    conv("matcher.key", c, c, 1)
    conv("matcher.value", c, c, 1)
    conv("transfer.0", 2 * c + 1, c, 1)
    for i in range(transfer_layers):
        resb(f"transfer.{i + 1}", c)
    conv(f"transfer.{transfer_layers + 1}", c, c // 2, 3)
    conv(f"transfer.{transfer_layers + 2}", c // 2, 3, 3)

    torch.save(
        {
            "state_dict": {k: torch.from_numpy(v) for k, v in sd.items()},
            "hyper_parameters": {
                "extraction_layers": extraction_layers,
                "transfer_layers": transfer_layers,
                "channels": channels,
            },
        },
        path,
    )


def _save_dmsct_ckpt(path):
    from color_transfer_tpu.models.dmsct import DMSCT
    from color_transfer_tpu.tools.convert_gmflow import invert_to_state_dict

    rs = np.random.default_rng(4)
    sd = _fabricate_smp_b2_state_dict()
    plan = [(241 + 97, 256), (256 + 49, 128), (128 + 65, 64), (64 + 7, 32)]
    for i, (cin, cout) in enumerate(plan):
        for conv, ci in (("conv1", cin), ("conv2", cout)):
            sd[f"decoder.blocks.{i}.{conv}.0.weight"] = rs.normal(
                scale=0.05, size=(cout, ci, 3, 3)
            ).astype(np.float32)
            sd[f"decoder.blocks.{i}.{conv}.0.bias"] = np.zeros(
                cout, dtype=np.float32
            )
    sd["head.0.weight"] = rs.normal(scale=0.05, size=(3, 32, 3, 3)).astype(
        np.float32
    )
    sd["head.0.bias"] = np.zeros(3, dtype=np.float32)

    model = DMSCT(matcher_num_layers=1, matcher_num_reg_refine=1)
    t = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        t, t,
    )
    matcher_sd = invert_to_state_dict(
        jax.tree_util.tree_map(np.asarray, variables["params"]["matcher"])
    )
    sd.update({f"matcher.{k}": v for k, v in matcher_sd.items()})

    torch.save(
        {
            "state_dict": {
                k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
            },
            "hyper_parameters": {
                "matcher_num_layers": 1,
                "matcher_num_reg_refine": 1,
            },
        },
        path,
    )


class TestParitySweep:
    def test_end_to_end_on_fabricated_assets(self, tmp_path, capsys):
        data_root = _make_data(tmp_path)
        dc = tmp_path / "dcmcs3di.ckpt"
        dm = tmp_path / "dmsct.ckpt"
        _save_dcmcs3di_ckpt(dc)
        _save_dmsct_ckpt(dm)

        out = tmp_path / "table.md"
        rc = parity_sweep.main([
            "--data_dir", str(data_root),
            "--dcmcs3di_ckpt", str(dc),
            "--dmsct_ckpt", str(dm),
            "--max_batches", "1",
            "--num_workers", "1",
            "--out", str(out),
        ])
        assert rc == 0
        table = out.read_text()
        # Every method present with finite metrics on the artificial split.
        for name in ["Reinhard", "Xiao", "linear MK", "iterative",
                     "DCMCS3DI", "DMSCT"]:
            assert name in table, table
        # Published PSNR column carries the comparison numbers.
        assert "35.26" in table

    def test_format_table_shape(self):
        results = {
            "Reinhard et al.": {
                "Test PSNR/dataloader_idx_0": 34.0,
                "Test SSIM/dataloader_idx_0": 0.96,
                "Test FSIM/dataloader_idx_0": 0.98,
                "Test iCID/dataloader_idx_0": 0.12,
                "Test PSNR/dataloader_idx_1": 32.0,
                "Test SSIM/dataloader_idx_1": 0.93,
                "Test FSIM/dataloader_idx_1": 0.95,
                "Test iCID/dataloader_idx_1": 0.17,
            }
        }
        table = parity_sweep.format_table(
            results, published=parity_sweep.PUBLISHED_ARTIFICIAL
        )
        lines = table.splitlines()
        assert lines[0].startswith("| Method | Dataset |")
        assert len(lines) == 4  # header + sep + 2 dataset rows
        assert "34.03" in table  # published artificial PSNR for Reinhard
