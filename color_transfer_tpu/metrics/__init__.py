"""On-device image quality metrics.

The reference evaluates every method with PSNR/SSIM/FSIM from the external
``piq`` package plus its own iCID translation (reference methods/__init__.py:32-35,
utils/icid.py). Here all four run on-device as jittable JAX functions over
channel-last ``(B, H, W, 3)`` batches in [0, 1], so the full eval sweep never
leaves the TPU.
"""

from color_transfer_tpu.metrics.basic import psnr, ssim, ssim_loss
from color_transfer_tpu.metrics.icid import icid
from color_transfer_tpu.metrics.fsim import fsim

__all__ = ["psnr", "ssim", "ssim_loss", "icid", "fsim"]
