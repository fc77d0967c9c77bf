"""EfficientNet encoder (b0-scalable, b2 by default) in Flax, NHWC.

DMSCT's trainable corrector uses segmentation_models_pytorch's
``get_encoder("efficientnet-b2", depth=4, weights=None)`` (reference
methods/dmsct.py:34-38) — an *untrained* encoder (configs/dmsct.yaml:7), but
architectural parity still matters for porting the published DMSCT
checkpoint: feature maps at reductions (1, 2, 4, 8, 16) with channels
(3, 32, 24, 48, 120) for b2/depth-4. Note the reduction-2 feature is the
**32-ch stem output** (smp's ``get_stages()`` stage 1 is
``_conv_stem + _bn0 + swish``), NOT the 16-ch stage-0 MBConv output — the
stage-0 blocks run (they feed the reduction-4 path) but are not tapped.

Standard EfficientNet ingredients: MBConv with expansion, depthwise conv,
squeeze-excite (ratio 0.25 of the block's input filters), BatchNorm
(momentum 0.99 / eps 1e-3), SiLU, stochastic depth (drop-connect 0.2 scaled
by block depth).
"""

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# (kernel, stride, expand, base_out_filters, base_repeats) for b0 stages.
_B0_STAGES = [
    (3, 1, 1, 16, 1),
    (3, 2, 6, 24, 2),
    (5, 2, 6, 40, 2),
    (3, 2, 6, 80, 3),
    (5, 1, 6, 112, 3),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
]

_COEFFS = {  # width, depth
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
}


def round_filters(filters, width, divisor=8):
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats, depth):
    return int(math.ceil(depth * repeats))


def encoder_out_channels(name="efficientnet-b2", depth=4):
    """smp-compatible out_channels tuple, e.g. b2/depth4 -> (3,32,24,48,120).

    Matches smp's encoders table (b2: (3, 32, 24, 48, 120, 352)): the
    reduction-2 entry is the stem width, not stage-0's MBConv width.
    """
    width, _ = _COEFFS[name]
    stage_out = [round_filters(s[3], width) for s in _B0_STAGES]
    # reductions: input, 1/2 (stem), 1/4 (stage1), 1/8 (stage2),
    # 1/16 (stage4), 1/32 (stage6)
    stem = round_filters(32, width)
    channels = (3, stem, stage_out[1], stage_out[2], stage_out[4], stage_out[6])
    return channels[: depth + 1]


class _BN(nn.Module):
    use_running_average: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        # flax computes the batch statistics in float32 regardless of dtype;
        # only the normalized output is cast.
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
        )(x)


class MBConv(nn.Module):
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        inp = x
        filters = self.in_filters * self.expand
        if self.expand != 1:
            x = nn.Conv(filters, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = _BN(not train, dtype=self.dtype, name="bn0")(x)
            x = nn.silu(x)

        # Depthwise conv
        pad = self.kernel // 2
        x = nn.Conv(
            filters,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=filters,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )(x)
        x = _BN(not train, dtype=self.dtype, name="bn1")(x)
        x = nn.silu(x)

        # Squeeze-excite on the block's input filter count. The global mean
        # accumulates in f32 (a bf16 mean over H*W pixels loses precision).
        se_filters = max(1, int(self.in_filters * self.se_ratio))
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        if self.dtype is not None:
            se = se.astype(self.dtype)
        se = nn.silu(nn.Conv(se_filters, (1, 1), dtype=self.dtype,
                             name="se_reduce")(se))
        se = nn.sigmoid(nn.Conv(filters, (1, 1), dtype=self.dtype,
                                name="se_expand")(se))
        x = x * se

        x = nn.Conv(self.out_filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(x)
        x = _BN(not train, dtype=self.dtype, name="bn2")(x)

        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1)
                )
                x = x * mask.astype(x.dtype) / keep
            x = x + inp
        return x


class EfficientNetEncoder(nn.Module):
    """Returns the smp-style feature pyramid [input, f2, f4, f8, f16, ...]
    up to ``depth`` reductions."""

    name_variant: str = "efficientnet-b2"
    depth: int = 4
    drop_connect_rate: float = 0.2
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train=False):
        width, depth_c = _COEFFS[self.name_variant]
        features = [x]

        stem = round_filters(32, width)
        y = nn.Conv(stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        y = _BN(not train, dtype=self.dtype, name="stem_bn")(y)
        y = nn.silu(y)
        # smp taps the stem output as the reduction-2 feature
        # (get_stages() stage 1 = _conv_stem + _bn0 + _swish).
        if self.depth >= 1:
            features.append(y)

        if len(features) == self.depth + 1:
            return features

        total_blocks = sum(round_repeats(s[4], depth_c) for s in _B0_STAGES)
        block_idx = 0
        in_filters = stem
        # Feature taps after stages 1, 2, 4, 6 (reductions 4, 8, 16, 32).
        taps = {1: 2, 2: 3, 4: 4, 6: 5}

        for stage_idx, (k, s, e, base_out, base_r) in enumerate(_B0_STAGES):
            out_filters = round_filters(base_out, width)
            repeats = round_repeats(base_r, depth_c)
            for r in range(repeats):
                y = MBConv(
                    in_filters=in_filters,
                    out_filters=out_filters,
                    kernel=k,
                    stride=s if r == 0 else 1,
                    expand=e,
                    drop_rate=self.drop_connect_rate * block_idx / total_blocks,
                    dtype=self.dtype,
                    name=f"stage{stage_idx}_block{r}",
                )(y, train=train)
                in_filters = out_filters
                block_idx += 1
            if stage_idx in taps and taps[stage_idx] <= self.depth:
                features.append(y)
            if len(features) == self.depth + 1:
                break

        return features
