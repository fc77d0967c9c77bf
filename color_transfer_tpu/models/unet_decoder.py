"""UNet decoder + segmentation head (smp parity), NHWC.

DMSCT decodes the per-level ``[feat_target, warped feat_reference, 1-occ]``
concatenations with segmentation_models_pytorch's UnetDecoder over channels
(256, 128, 64, 32), use_batchnorm=False, and a 3-channel SegmentationHead
(reference methods/dmsct.py:40-56). smp semantics reproduced:

  * features reversed; deepest becomes the head, the rest are skips;
  * each block: x2 nearest upsample -> concat skip -> Conv3x3+ReLU x2;
  * head: Conv3x3 to out_channels, no activation.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from color_transfer_tpu.core.resize import resize_nearest


def _upsample2x_nearest(x):
    b, h, w, c = x.shape
    return resize_nearest(jnp.moveaxis(x, -1, 1), (2 * h, 2 * w)).transpose(0, 2, 3, 1)


class DecoderBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, skip=None):
        x = _upsample2x_nearest(x)
        if skip is not None:
            if self.dtype is not None:
                skip = skip.astype(self.dtype)
            x = jnp.concatenate([x.astype(skip.dtype), skip], axis=-1)
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name="conv2")(x))
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, *features):
        feats = list(features)[::-1]  # deepest first
        x = feats[0]
        skips = feats[1:]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(x, skip)
        return x


class SegmentationHead(nn.Module):
    out_channels: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)
