"""examples/demo.py — the reference demo.ipynb as a script."""

import numpy as np
from PIL import Image


def _stereopair(tmp_path, rng, shape=(24, 32)):
    # Smooth low-frequency content (closer to a natural image than noise) so
    # every classical method can improve on the hue-distorted input.
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            120 + 60 * np.sin(xx / 7.0) + 20 * np.cos(yy / 5.0),
            100 + 50 * np.cos(xx / 9.0 + 1.0) + 25 * np.sin(yy / 6.0),
            140 + 40 * np.sin((xx + yy) / 8.0),
        ],
        axis=-1,
    )
    base += rng.normal(0, 4, base.shape)
    left = np.clip(base, 0, 255).astype(np.uint8)
    right = np.clip(base + 20, 0, 255).astype(np.uint8)
    lp, rp = tmp_path / "0000_L.png", tmp_path / "0000_R.png"
    Image.fromarray(left).save(lp)
    Image.fromarray(right).save(rp)
    return lp, rp


def test_demo_classical_panel(tmp_path, rng, capsys):
    from examples.demo import main

    lp, rp = _stereopair(tmp_path, rng)
    out_dir = tmp_path / "panels"
    main([
        "--left", str(lp), "--right", str(rp), "--out", str(out_dir),
    ])
    stdout = capsys.readouterr().out
    # One metric row per method plus the distorted-input row.
    for name in (
        "distorted input", "reinhard", "correlated_color_space",
        "monge_kantorovitch", "idt", "automated_color_grading",
    ):
        assert name in stdout
        assert (out_dir / f"{name.replace(' ', '_')}.png").exists()
    # Every method must improve PSNR over the hue-distorted input.
    rows = [l for l in stdout.splitlines() if l and not l.startswith("method")]
    psnr = {r[:28].strip(): float(r[28:].split()[0]) for r in rows
            if not r.startswith("wrote")}
    base = psnr.pop("distorted input")
    for name, value in psnr.items():
        assert value > base, f"{name}: {value} <= distorted {base}"
