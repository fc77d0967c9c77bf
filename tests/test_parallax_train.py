"""Chunked training matcher (ops/parallax_train.py) vs the materialized
reference path (models/pasm.py): outputs, loss values AND gradients must
agree — the chunked path is a pure memory optimization (recompute-in-backward
via scan+checkpoint), not an approximation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from color_transfer_tpu.models import pasm
from color_transfer_tpu.models.dcmcs3di import (
    DCMCS3DI,
    compute_losses,
    compute_losses_fused,
)
from color_transfer_tpu.ops.parallax_train import chunked_parallax_train


def _inputs(b=2, h=12, w=16, c=8, cv=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return {
        "q_l": mk(b, h, w, c),
        "k_l": mk(b, h, w, c),
        "q_r": mk(b, h, w, c),
        "k_r": mk(b, h, w, c),
        "v_r": mk(b, h, w, cv),
        "img_l": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)),
        "img_r": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)),
    }


def _materialized(x, scale):
    """The reference semantics via the materialized pasm path."""
    cost_r2l = jnp.einsum("bhwc,bhvc->bhwv", x["q_l"], x["k_r"]) * scale
    cost_l2r = jnp.einsum("bhwc,bhvc->bhwv", x["q_r"], x["k_l"]) * scale
    att, att_cycle, valid_mask = pasm.output((cost_r2l, cost_l2r))
    warped_v = pasm.warp(x["v_r"], att[0])
    losses = {
        "photometric": pasm.loss_pam_photometric(
            x["img_l"], x["img_r"], att, valid_mask
        ),
        "cycle": pasm.loss_pam_cycle(att_cycle, valid_mask),
        "smoothness": pasm.loss_pam_smoothness(att),
    }
    return warped_v, valid_mask, losses


@pytest.mark.parametrize("chunk", [1, 3, 4, 12])
def test_outputs_and_losses_match(chunk):
    x = _inputs()
    scale = 1.0 / 8

    warped_m, masks_m, losses_m = _materialized(x, scale)
    warped_c, mask_l, mask_r, losses_c = chunked_parallax_train(
        x["q_l"], x["k_l"], x["q_r"], x["k_r"], x["v_r"],
        x["img_l"], x["img_r"], scale=scale, chunk=chunk,
    )

    np.testing.assert_allclose(np.asarray(warped_c), np.asarray(warped_m),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask_l), np.asarray(masks_m[0]))
    np.testing.assert_array_equal(np.asarray(mask_r), np.asarray(masks_m[1]))
    for k in losses_m:
        np.testing.assert_allclose(
            float(losses_c[k]), float(losses_m[k]), rtol=1e-5, atol=1e-6,
        )


def test_gradients_match():
    """d(total)/d(inputs) identical between chunked-remat and materialized."""
    x = _inputs(b=1, h=8, w=12, c=6, cv=6, seed=1)
    scale = 1.0 / 6

    def total_materialized(x):
        warped, _, losses = _materialized(x, scale)
        return (
            jnp.sum(warped**2)
            + losses["photometric"]
            + losses["cycle"]
            + losses["smoothness"]
        )

    def total_chunked(x):
        warped, _, _, losses = chunked_parallax_train(
            x["q_l"], x["k_l"], x["q_r"], x["k_r"], x["v_r"],
            x["img_l"], x["img_r"], scale=scale, chunk=2,
        )
        return (
            jnp.sum(warped**2)
            + losses["photometric"]
            + losses["cycle"]
            + losses["smoothness"]
        )

    g_m = jax.grad(total_materialized)(x)
    g_c = jax.grad(total_chunked)(x)
    for k in x:
        np.testing.assert_allclose(
            np.asarray(g_c[k]), np.asarray(g_m[k]), rtol=2e-4, atol=1e-5,
        )


def test_model_fused_forward_matches_standard():
    """DCMCS3DI.fused_train_forward == standard forward + compute_losses
    (same params, same batch)."""
    model = DCMCS3DI(extraction_layers=2, transfer_layers=1, channels=8)
    rng = np.random.default_rng(2)
    batch = {
        "gt": jnp.asarray(rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)),
    }
    batch["target"] = jnp.clip(batch["gt"] * 1.2 - 0.05, 0, 1)
    batch["reference"] = jnp.asarray(
        rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
    )

    params = model.init(
        jax.random.PRNGKey(0), batch["target"], batch["reference"]
    )["params"]

    out_std = model.apply({"params": params}, batch["target"], batch["reference"])
    total_std, parts_std = compute_losses(out_std, batch)

    corrected_f, pam = model.apply(
        {"params": params},
        batch["target"],
        batch["reference"],
        chunk=4,
        method=model.fused_train_forward,
    )
    total_f, parts_f = compute_losses_fused(corrected_f, pam, batch)

    np.testing.assert_allclose(
        np.asarray(corrected_f), np.asarray(out_std[0]), atol=1e-5
    )
    np.testing.assert_allclose(float(total_f), float(total_std), rtol=1e-5)
    for k in parts_std:
        np.testing.assert_allclose(
            float(parts_f[k]), float(parts_std[k]), rtol=1e-4, atol=1e-6
        )
