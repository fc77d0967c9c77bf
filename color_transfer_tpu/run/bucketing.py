"""Eval-shape bucketing: O(buckets) XLA compiles for mixed-shape sweeps.

The reference evaluates every real-world frame at its native size — fine for
torch's dynamic shapes, but under jit each distinct (H, W) costs a full XLA
compile (minutes over this image's remote-compile tunnel; SURVEY.md §7 hard
part #5). Bucketing snaps each input up to a static ladder of padded shapes:

  * images are ZERO-padded to the bucket (matching SAME-conv zero-padding
    semantics, so conv features away from the true boundary are unchanged),
  * DCMCS3DI masks attention columns beyond the true width (``valid_w``) so
    padded pixels never receive attention mass,
  * metrics are computed with a validity mask at the bucket shape — PSNR is
    EXACT; SSIM masks to windows fully inside the true region (exact map
    positions, downsample factor taken from the bucket); FSIM/iCID run on the
    zeroed-masked pair (boundary-band approximation).

Exactness notes: model outputs inside the true region differ from native-
shape eval only within a conv-receptive-field band of the padded border
(conv biases tint the padded region after the first layer). The drift is
quantified in tests/test_bucketing.py on small shapes.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from color_transfer_tpu import metrics as M
from color_transfer_tpu.metrics.basic import _ssim_map
from color_transfer_tpu.core.resize import avg_pool2d


def snap_shape(h, w, multiple=64):
    """Smallest (H, W) >= (h, w) with both dims multiples of ``multiple``."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


def pad_batch(batch, bucket_hw, keys=("gt", "target", "reference")):
    """Zero-pad image entries of ``batch`` (B, H, W, C) up to bucket_hw.

    Returns (padded_batch, true_hw).
    """
    bh, bw = bucket_hw
    out = dict(batch)
    true_hw = None
    for k in keys:
        if k not in batch:
            continue
        x = batch[k]
        h, w = x.shape[1], x.shape[2]
        true_hw = (h, w)
        out[k] = jnp.pad(x, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)))
    return out, true_hw


def _valid_mask(shape_hw, h_t, w_t, dtype=jnp.float32):
    bh, bw = shape_hw
    ih = lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    iw = lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    return ((ih < h_t) & (iw < w_t)).astype(dtype)


def masked_psnr(x, y, h_t, w_t, data_range=1.0, eps=1e-10):
    """piq.psnr over only the true region — exact (masked mean)."""
    mask = _valid_mask(x.shape[1:3], h_t, w_t, x.dtype)[None, ..., None]
    err = ((x - y) * mask) ** 2
    n = h_t * w_t * x.shape[-1]
    mse = jnp.sum(err, axis=(1, 2, 3)) / n
    return jnp.mean(10.0 * jnp.log10(data_range**2 / (mse + eps)))


def masked_ssim(x, y, h_t, w_t, kernel_size=11, kernel_sigma=1.5,
                data_range=1.0):
    """piq.ssim restricted to valid-conv windows fully inside the true
    region. Window positions that only see true pixels produce EXACTLY the
    native map values; the downsample factor comes from the bucket shape
    (equal to the native factor whenever both land in the same /256 band)."""
    x = jnp.moveaxis(x, -1, 1)
    y = jnp.moveaxis(y, -1, 1)
    f = max(1, round(min(x.shape[-2], x.shape[-1]) / 256))
    if f > 1:
        x = avg_pool2d(x, f)
        y = avg_pool2d(y, f)
        h_t = h_t // f
        w_t = w_t // f
    smap = _ssim_map(x, y, kernel_size, kernel_sigma, data_range, 0.01, 0.03,
                     "valid")
    mh, mw = smap.shape[-2], smap.shape[-1]
    ih = lax.broadcasted_iota(jnp.int32, (mh, mw), 0)
    iw = lax.broadcasted_iota(jnp.int32, (mh, mw), 1)
    valid = ((ih <= h_t - kernel_size) & (iw <= w_t - kernel_size)).astype(
        smap.dtype
    )[None, None]
    count = (h_t - kernel_size + 1) * (w_t - kernel_size + 1)
    per_image = jnp.sum(smap * valid, axis=(1, 2, 3)) / (
        smap.shape[1] * count
    )
    return jnp.mean(per_image)


def masked_quality_metrics(out, gt, h_t, w_t, prefix="", heavy=True):
    """The reference metric suite at a bucket shape with a true-region mask.

    PSNR exact; SSIM exact on interior windows; FSIM/iCID evaluated on the
    zeroed-masked pair (identical zeros outside the true region — a
    boundary-band approximation, quantified in tests).
    """
    mask = _valid_mask(out.shape[1:3], h_t, w_t, out.dtype)[None, ..., None]
    out_m = out * mask
    gt_m = gt * mask
    # iCID masks its final mean to the true region (metrics/icid.py
    # valid_hw); FSIM self-normalizes (sum S*PC / sum PC, and the identical
    # flat-zero pad region carries ~no phase congruency). Both retain a
    # blur-band approximation at the pad boundary.
    vals = {
        f"{prefix}PSNR": masked_psnr(out, gt, h_t, w_t),
        f"{prefix}SSIM": masked_ssim(out, gt, h_t, w_t),
        f"{prefix}iCID": M.icid(out_m, gt_m, valid_hw=(h_t, w_t)),
    }
    if heavy:
        vals[f"{prefix}FSIM"] = M.fsim(out_m, gt_m, valid_hw=(h_t, w_t))
    return vals


class BucketedEvaluator:
    """Shape-bucketed eval driver: one jit compile per (bucket, batch-size)
    instead of one per distinct input shape."""

    def __init__(self, module, multiple=64):
        self.module = module
        self.multiple = multiple
        self._fns = {}

    def _fn(self, bucket, heavy):
        key = (bucket, heavy)
        if key not in self._fns:
            module = self.module
            # Modules that accept a dynamic true-width get attention masking
            # (DCMCS3DIModule sets supports_valid_w; see models/dcmcs3di.py).
            use_valid_w = getattr(module, "supports_valid_w", False)

            @jax.jit
            def run(params, batch, h_t, w_t):
                if use_valid_w:
                    out, _ = module.model.apply(
                        _wrap_params(params),
                        batch["target"],
                        batch["reference"],
                        inference=True,
                        valid_w=w_t,
                    )
                else:
                    out = module.eval_forward(params, batch)
                out = jnp.clip(out, 0.0, 1.0)
                return out, masked_quality_metrics(
                    out, batch["gt"], h_t, w_t, heavy=heavy
                )

            self._fns[key] = run
        return self._fns[key]

    def eval_batch(self, params, batch, heavy=True):
        """Pad to the bucket, run the model, return masked metrics."""
        h, w = batch["gt"].shape[1], batch["gt"].shape[2]
        bucket = snap_shape(h, w, self.multiple)
        padded, _ = pad_batch(batch, bucket)
        fn = self._fn(bucket, heavy)
        out, logs = fn(params, padded, jnp.int32(h), jnp.int32(w))
        return out[:, :h, :w], logs


def _wrap_params(params):
    if isinstance(params, dict) and (
        "params" in params or "batch_stats" in params
    ):
        return params
    return {"params": params}
