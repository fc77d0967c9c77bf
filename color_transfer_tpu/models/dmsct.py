"""DMSCT — Deep Multi-Scale Color Transfer (the reference authors' method).

Flax re-design of reference methods/dmsct.py:19-195: a frozen GMFlow matcher
produces bidirectional flow + occlusion; a trainable EfficientNet-b2/UNet
corrector consumes, per pyramid level, the concatenation
``[feat_target, flow_warp(feat_reference, flow / 2^idx), 1 - occ / 2^idx]``
and predicts a residual added onto the distorted target (:104-116).

Static-shape policies (SURVEY.md §7 hard part #5): the matcher resolution cap
(x32-rounded, <=500*900 area — reference :58-74) and the x16 encoder padding
(:76-82) are computed from the static input shape at trace time, so every
train/eval shape compiles exactly one executable.

Freezing: the matcher's parameters live under params['matcher']; the training
module masks them out of the optimizer (the JAX analogue of
``requires_grad=False``, reference :31-32) and its outputs are wrapped in
stop_gradient.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from color_transfer_tpu.core.resize import (
    derive_matcher_size,
    resize_nearest,
    upsample_flow_bilinear,
)
from color_transfer_tpu.core.sampling import flow_warp_batched
from color_transfer_tpu.models.efficientnet import EfficientNetEncoder
from color_transfer_tpu.models.gmflow import GMFlow
from color_transfer_tpu.models.unet_decoder import UnetDecoder, SegmentationHead
from color_transfer_tpu import metrics


class DMSCT(nn.Module):
    encoder_name: str = "efficientnet-b2"
    encoder_depth: int = 4
    decoder_channels: Sequence[int] = (256, 128, 64, 32)
    matcher_num_reg_refine: int = 6
    matcher_num_layers: int = 6
    matcher_max_area: int = 500 * 900
    # Defaults are bit-strict-parity f32. "bfloat16" is the UNGATED
    # throughput path (halves the correlation kernel's VMEM traffic / the
    # backbone+transformer conv+matmul cost): every bf16 matcher flavor
    # fails the 31-distortion drift gate at random init (the iterative
    # refinement amplifies any upstream rounding to a saturated ~0.11 dB —
    # PARITY_RESULTS.md round-5), so serving surfaces warn unless
    # allow_ungated is passed (methods/gates.py).
    matcher_corr_dtype: str = "float32"
    matcher_compute_dtype: str = None  # None = float32 everywhere
    # Mixed precision for the trainable corrector (encoder/decoder/head
    # convs in this dtype, f32 params): BatchNorm statistics, the SE global
    # mean, the flow warp and the residual add stay float32.
    corrector_compute_dtype: str = None
    # Fused Pallas windowed attention inside the matcher transformer
    # (models/gmflow.py::UniMatchFlow.fused_attention).
    matcher_fused_attention: object = "auto"
    # Selective precision: "float32" confines matcher bf16 to the
    # feature-producing stacks and keeps all flow arithmetic (correlation
    # expectations, self-attn propagation, GRU refinement) f32 — see
    # UniMatchFlow.refine_dtype. Measured round-5: does NOT rescue the
    # drift gate (feature rounding alone saturates the refinement's
    # chaotic amplification), but narrows flow error under bf16 compute.
    matcher_refine_dtype: str = None

    def setup(self):
        self.matcher = GMFlow(
            num_transformer_layers=self.matcher_num_layers,
            num_reg_refine=self.matcher_num_reg_refine,
            corr_dtype=jnp.dtype(self.matcher_corr_dtype).type,
            compute_dtype=(
                jnp.dtype(self.matcher_compute_dtype).type
                if self.matcher_compute_dtype
                else None
            ),
            fused_attention=self.matcher_fused_attention,
            refine_dtype=(
                jnp.dtype(self.matcher_refine_dtype).type
                if self.matcher_refine_dtype
                else None
            ),
        )
        corr_dt = (
            jnp.dtype(self.corrector_compute_dtype).type
            if self.corrector_compute_dtype
            else None
        )
        self.encoder = EfficientNetEncoder(
            name_variant=self.encoder_name, depth=self.encoder_depth,
            dtype=corr_dt,
        )
        self.decoder = UnetDecoder(tuple(self.decoder_channels), dtype=corr_dt)
        self.head = SegmentationHead(3, dtype=corr_dt)

    def __call__(self, target, reference, train=False):
        """target/reference: (B, H, W, 3) in [0, 1], NHWC. Returns the
        corrected target clipped to [0, 1]."""
        b, height, width, _ = target.shape

        matcher_size = derive_matcher_size(
            height, width, max_area=self.matcher_max_area
        )
        matcher_out = self.matcher(
            target * 255.0,
            reference * 255.0,
            pred_bidir_flow=True,
            fwd_bwd_consistency_check=True,
            inference_size=matcher_size,
        )
        flow = jax.lax.stop_gradient(matcher_out["flow"])
        fwd_occ = jax.lax.stop_gradient(matcher_out["fwd_occ"])

        # Pad everything to x16 for the depth-4 encoder (reference :76-82,
        # replicate == edge padding).
        factor = 2**self.encoder_depth
        pad_h = (-height) % factor
        pad_w = (-width) % factor

        def pad(x):
            return jnp.pad(
                x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge"
            )

        flow = pad(flow)
        not_occ = pad(1.0 - fwd_occ)

        features_target = self.encoder(pad(target), train=train)
        features_reference = self.encoder(pad(reference), train=train)

        features = []
        for idx, (feat_t, feat_r) in enumerate(
            zip(features_target, features_reference)
        ):
            # The warp gather/scatter (custom-VJP Pallas adjoint) runs f32;
            # the decoder re-casts its inputs under the mixed-precision
            # recipe, so this boundary costs one cast, not precision.
            feat_t = feat_t.astype(jnp.float32)
            feat_r = feat_r.astype(jnp.float32)
            flow_idx = upsample_flow_bilinear(flow, 2.0**-idx) if idx else flow
            # custom-VJP warp: the feature cotangent scatters in a Pallas
            # kernel (XLA's serialized scatter costs ~2.4 s/step here).
            warped = flow_warp_batched(feat_r, flow_idx)
            occ_idx = (
                jnp.moveaxis(
                    resize_nearest(
                        jnp.moveaxis(not_occ, -1, 1), flow_idx.shape[1:3]
                    ),
                    1,
                    -1,
                )
                if idx
                else not_occ
            )
            features.append(jnp.concatenate([feat_t, warped, occ_idx], axis=-1))

        residual = self.head(self.decoder(*features)).astype(jnp.float32)
        corrected = target + residual[:, :height, :width, :]
        return jnp.clip(corrected, 0.0, 1.0)


def compute_losses(result, gt):
    """MSE + 0.1*SSIM (reference methods/dmsct.py:121-122)."""
    loss_mse = jnp.mean((result - gt) ** 2)
    loss_ssim = 0.1 * metrics.ssim_loss(result, gt, window_size=11)
    return loss_mse + loss_ssim, {"MSE Loss": loss_mse, "SSIM Loss": loss_ssim}
