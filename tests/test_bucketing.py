"""Eval-shape bucketing (run/bucketing.py): masked metrics are exact (PSNR,
SSIM) or boundary-band-approximate (FSIM/iCID), DCMCS3DI's valid_w masking
keeps padded columns out of the attention, and the bucketed evaluator
compiles once per bucket."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu import metrics as M
from color_transfer_tpu.run import bucketing as B
from color_transfer_tpu.run.modules import DCMCS3DIModule


def _pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    out = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
    return jnp.asarray(out), jnp.asarray(gt)


def test_snap_shape():
    assert B.snap_shape(100, 130, 64) == (128, 192)
    assert B.snap_shape(64, 128, 64) == (64, 128)


def test_masked_psnr_exact():
    out, gt = _pair(40, 56)
    want = float(M.psnr(out, gt))
    out_p = jnp.pad(out, ((0, 0), (0, 24), (0, 8), (0, 0)))
    gt_p = jnp.pad(gt, ((0, 0), (0, 24), (0, 8), (0, 0)))
    got = float(B.masked_psnr(out_p, gt_p, jnp.int32(40), jnp.int32(56)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masked_ssim_exact():
    out, gt = _pair(48, 64, seed=1)
    want = float(M.ssim(out, gt))
    out_p = jnp.pad(out, ((0, 0), (0, 16), (0, 64), (0, 0)))
    gt_p = jnp.pad(gt, ((0, 0), (0, 16), (0, 64), (0, 0)))
    got = float(B.masked_ssim(out_p, gt_p, jnp.int32(48), jnp.int32(64)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_heavy_metrics_close():
    """FSIM/iCID on the zeroed-masked padded pair: boundary-band
    approximation must stay within a small tolerance of the native value."""
    out, gt = _pair(96, 128, seed=2)
    native = {
        "iCID": float(M.icid(out, gt)),
        "FSIM": float(M.fsim(out, gt)),
    }
    logs = B.masked_quality_metrics(
        jnp.pad(out, ((0, 0), (0, 32), (0, 64), (0, 0))),
        jnp.pad(gt, ((0, 0), (0, 32), (0, 64), (0, 0))),
        jnp.int32(96),
        jnp.int32(128),
    )
    assert abs(float(logs["iCID"]) - native["iCID"]) < 0.02
    assert abs(float(logs["FSIM"]) - native["FSIM"]) < 0.02


def test_bucketed_dcmcs3di_close_to_native():
    """Bucketed eval of DCMCS3DI: valid_w attention masking + zero padding
    keep the padded-eval PSNR within a small drift of native-shape eval
    (the residual drift is the conv-bias boundary band)."""
    module = DCMCS3DIModule(
        extraction_layers=2, transfer_layers=1, channels=8, heavy_metrics=False
    )
    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 1, (1, 40, 56, 3)).astype(np.float32)
    batch = {
        "gt": jnp.asarray(gt),
        "target": jnp.asarray(np.clip(gt * 1.15, 0, 1)),
        "reference": jnp.asarray(
            rng.uniform(0, 1, (1, 40, 56, 3)).astype(np.float32)
        ),
    }
    state = module.init_state(jax.random.PRNGKey(0), batch)
    params = state.params

    out_native = module.eval_forward(params, batch)
    psnr_native = float(M.psnr(out_native, batch["gt"]))

    ev = B.BucketedEvaluator(module, multiple=32)
    out_bucketed, logs = ev.eval_batch(params, batch)

    assert out_bucketed.shape == out_native.shape
    # Interior pixels (outside the receptive-field boundary band) match.
    band = 16
    np.testing.assert_allclose(
        np.asarray(out_bucketed[:, :-band, :-band]),
        np.asarray(out_native[:, :-band, :-band]),
        atol=1e-4,
    )
    assert abs(float(logs["PSNR"]) - psnr_native) < 0.5, (
        f"bucketed PSNR {float(logs['PSNR'])} vs native {psnr_native}"
    )


def test_bucketed_evaluator_reuses_compilation():
    module = DCMCS3DIModule(
        extraction_layers=1, transfer_layers=1, channels=8, heavy_metrics=False
    )
    rng = np.random.default_rng(4)

    def make(h, w):
        gt = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        return {
            "gt": jnp.asarray(gt),
            "target": jnp.asarray(np.clip(gt * 1.1, 0, 1)),
            "reference": jnp.asarray(gt[:, ::-1].copy()),
        }

    batch = make(40, 56)
    state = module.init_state(jax.random.PRNGKey(0), batch)
    ev = B.BucketedEvaluator(module, multiple=64)
    ev.eval_batch(state.params, batch)
    # A different true shape landing in the same bucket: no new jit entry.
    ev.eval_batch(state.params, make(33, 50))
    assert len(ev._fns) == 1
