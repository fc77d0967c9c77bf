"""DCMCS3DI — Deep Color Mismatch Correction in Stereoscopic 3D Images.

Flax re-design of the reference's Croci et al. reimplementation
(reference methods/dcmcs3di.py:29-147): siamese ResB extractor -> parallax
attention matcher -> transfer net, trained with L1 + MSE + SSIM plus
0.005-weighted PAM losses (photometric / cycle / smoothness).

NHWC throughout. ``inference=True`` drops the cycle maps and right-view mask
like the reference (reference pasmnet/utils.py:37-40) and is the hook for the
Pallas fused row-attention path.
"""


import jax
import jax.numpy as jnp
import flax.linen as nn

from color_transfer_tpu.models.layers import Conv, ResB
from color_transfer_tpu.models import pasm
from color_transfer_tpu import metrics


class Extractor(nn.Module):
    """Conv(3->C) + N ResB (reference methods/dcmcs3di.py:41-43)."""

    channels: int = 64
    layers: int = 18
    dtype: jnp.dtype = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.channels, dtype=self.dtype)(x)
        # Explicit names keep the param tree identical with/without remat
        # (nn.remat would otherwise rename ResB_i -> CheckpointResB_i and
        # break checkpoint portability).
        block = nn.remat(ResB) if self.remat else ResB
        for i in range(self.layers):
            x = block(self.channels, dtype=self.dtype, name=f"ResB_{i}")(x)
        return x

    def fused(self, x, group=3, rows=128, interpret=False):
        """Inference extraction through the fused conv-chain kernel
        (ops/conv_chain.py): stem conv in XLA, then the whole ResB stack
        halo-tiled through VMEM. Same param tree as ``__call__`` — reads
        the already-initialized variables, so only valid on a bound,
        initialized module (serving/eval), never under ``init``.
        Returns float32 features."""
        from color_transfer_tpu.ops.conv_chain import resb_chain

        p = self.variables["params"]
        cd = self.dtype or jnp.float32
        stem = p["Conv_0"]["Conv_0"]
        y = jax.lax.conv_general_dilated(
            x.astype(cd), stem["kernel"].astype(cd), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + stem["bias"].astype(cd)
        kernels = jnp.stack([
            jnp.stack([
                p[f"ResB_{i}"][f"Conv_{j}"]["Conv_0"]["kernel"]
                for j in (0, 1)
            ])
            for i in range(self.layers)
        ])
        biases = jnp.stack([
            jnp.stack([
                p[f"ResB_{i}"][f"Conv_{j}"]["Conv_0"]["bias"]
                for j in (0, 1)
            ])
            for i in range(self.layers)
        ])
        g = min(group, self.layers)
        while self.layers % g:
            g -= 1
        return resb_chain(
            y, kernels, biases, group=g, rows=rows, compute_dtype=cd,
            interpret=interpret,
        )


class TransferNet(nn.Module):
    """Conv1x1(2C+1 -> C) + N ResB + Conv(C->C/2) + Conv(C/2->3)
    (reference methods/dcmcs3di.py:47-51)."""

    channels: int = 64
    layers: int = 6
    dtype: jnp.dtype = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.channels, kernel_size=1, dtype=self.dtype)(x)
        block = nn.remat(ResB) if self.remat else ResB
        for i in range(self.layers):
            x = block(self.channels, dtype=self.dtype, name=f"ResB_{i}")(x)
        x = Conv(self.channels // 2, dtype=self.dtype)(x)
        return Conv(3, dtype=self.dtype)(x)

    def fused(self, x, group=3, rows=128, interpret=False):
        """Inference path through the fused conv-chain kernel: 1x1 stem and
        the two tail convs in XLA, the ResB stack halo-tiled through VMEM
        (see Extractor.fused)."""
        from color_transfer_tpu.ops.conv_chain import resb_chain

        p = self.variables["params"]
        cd = self.dtype or jnp.float32

        def conv(v, tree):
            return jax.lax.conv_general_dilated(
                v.astype(cd), tree["Conv_0"]["kernel"].astype(cd), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + tree["Conv_0"]["bias"].astype(cd)

        y = conv(x, p["Conv_0"])
        kernels = jnp.stack([
            jnp.stack([
                p[f"ResB_{i}"][f"Conv_{j}"]["Conv_0"]["kernel"]
                for j in (0, 1)
            ])
            for i in range(self.layers)
        ])
        biases = jnp.stack([
            jnp.stack([
                p[f"ResB_{i}"][f"Conv_{j}"]["Conv_0"]["bias"]
                for j in (0, 1)
            ])
            for i in range(self.layers)
        ])
        g = min(group, self.layers)
        while self.layers % g:
            g -= 1
        y = resb_chain(y, kernels, biases, group=g, rows=rows,
                       compute_dtype=cd, interpret=interpret)
        y = conv(y, p["Conv_1"])
        return conv(y, p["Conv_2"])


class DCMCS3DI(nn.Module):
    """``compute_dtype`` is the opt-in mixed-precision recipe: extraction and
    transfer convs run in that dtype (params stay float32), while the matcher
    — cost-volume statistics, softmax, PAM losses — stays float32. Default
    None is the bit-strict float32 path the parity suite pins."""

    extraction_layers: int = 18
    transfer_layers: int = 6
    channels: int = 64
    compute_dtype: jnp.dtype = None
    # Rematerialize the ResB stacks on the backward pass (jax.checkpoint):
    # activation memory drops from O(layers) to O(1) conv outputs, buying
    # larger crops/batches for one extra forward's FLOPs. Param-tree and
    # bitwise output identical either way.
    remat_convs: bool = False

    def setup(self):
        self.extraction = Extractor(
            self.channels, self.extraction_layers, dtype=self.compute_dtype,
            remat=self.remat_convs,
        )
        self.matcher = pasm.PAB(self.channels)
        self.transfer = TransferNet(
            self.channels, self.transfer_layers, dtype=self.compute_dtype,
            remat=self.remat_convs,
        )

    def _extract(self, left, right):
        """Siamese extraction; features return to float32 at the matcher
        boundary so attention/mask statistics are dtype-independent."""
        fea = self.extraction(jnp.concatenate([left, right], axis=0))
        return jnp.split(fea.astype(jnp.float32), 2, axis=0)

    def __call__(self, left, right, inference=False, use_pallas=False,
                 pallas_interpret=False, pallas_precise=False, valid_w=None,
                 fused_extraction=None):
        """left = distorted target view, right = reference view; NHWC [0,1].

        Returns (corrected_left, aux) with aux = (att, att_cycle, valid_mask,
        warped_right) exactly like the reference forward
        (reference methods/dcmcs3di.py:53-66).

        ``use_pallas`` (inference only) routes the matcher through the fused
        row-attention kernel — no (B, H, W, W) materialization, enabling
        full-res 1080p on one chip (the reference downscales 0.75x instead,
        demo.ipynb cell 24). aux is (None, ...) on that path.

        ``valid_w`` (dynamic scalar, bucketed-eval path) masks attention
        columns >= valid_w so zero-padded width never receives attention
        mass (run/bucketing.py).

        ``fused_extraction`` routes the ResB stacks through the conv-chain
        Pallas kernel (ops/conv_chain.py). None = auto: engage on the
        Pallas inference path when the bf16 compute recipe is active (the
        XLA convs are the serving bottleneck there, PERF.md roofline).
        """
        if fused_extraction is None:
            # not is_initializing(): the fused path reads already-bound
            # params directly, so auto-engaging during model.init would
            # KeyError before any params exist — init always takes the
            # flax path (ADVICE r4).
            fused_extraction = bool(
                inference and use_pallas
                and not self.is_initializing()
                and self.compute_dtype is not None
                and jnp.dtype(self.compute_dtype) == jnp.bfloat16
            )
        # Shared-weight siamese extraction via batch concat — one conv stack
        # pass for both views (the batch-dim trick the reference uses in its
        # matcher, unimatch/unimatch.py:68).
        if inference and fused_extraction:
            fea = self.extraction.fused(
                jnp.concatenate([left, right], axis=0),
                interpret=pallas_interpret,
            )
            fea_left, fea_right = jnp.split(fea, 2, axis=0)
        else:
            fea_left, fea_right = self._extract(left, right)

        if inference and use_pallas:
            from color_transfer_tpu.ops.row_attention import fused_parallax_inference

            head = self.matcher.head(jnp.concatenate([fea_left, fea_right], axis=0))
            q_l, q_r = jnp.split(self.matcher.query(head), 2, axis=0)
            k_l, k_r = jnp.split(self.matcher.key(head), 2, axis=0)
            warped, valid_mask_left = fused_parallax_inference(
                q_l=q_l,
                k_r=k_r,
                v_r=self.matcher.value(fea_right),
                q_r=q_r,
                k_l=k_l,
                scale=1.0 / self.channels,
                interpret=pallas_interpret,
                precise=pallas_precise,
            )
            mask = valid_mask_left.astype(fea_left.dtype)
            cat = jnp.concatenate([fea_left, warped, mask], axis=-1)
            corrected = (
                self.transfer.fused(cat, interpret=pallas_interpret)
                if fused_extraction else self.transfer(cat)
            )
            return jnp.clip(corrected.astype(jnp.float32), 0.0, 1.0), (
                (None, None),
                (None, None),
                (valid_mask_left, None),
                None,
            )

        costs = self.matcher(fea_left, fea_right)
        if valid_w is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, costs[0].shape, 3)
            costs = tuple(jnp.where(col < valid_w, c, -1e30) for c in costs)
        att, att_cycle, valid_mask = pasm.output(
            costs, inference, valid_w=valid_w
        )

        fea_warped_right = pasm.warp(self.matcher.value_features(fea_right), att[0])

        mask = valid_mask[0].astype(fea_left.dtype)
        cat = jnp.concatenate([fea_left, fea_warped_right, mask], axis=-1)
        corrected = (
            self.transfer.fused(cat, interpret=pallas_interpret)
            if inference and fused_extraction else self.transfer(cat)
        )

        return jnp.clip(corrected.astype(jnp.float32), 0.0, 1.0), (
            att,
            att_cycle,
            valid_mask,
            pasm.warp(right, att[0]),
        )

    def fused_train_forward(self, left, right, chunk=8):
        """Training forward through the chunked matcher
        (ops/parallax_train.py): identical corrected output and PAM loss
        values as ``__call__`` + ``compute_losses``, but the (B, H, W, W)
        attention volumes never materialize — lifting the reference's
        crop-size HBM ceiling (SURVEY.md §7 hard part #4).

        Returns (corrected_left, pam_losses) where pam_losses holds the
        UNWEIGHTED photometric/cycle/smoothness scalars.
        """
        from color_transfer_tpu.ops.parallax_train import chunked_parallax_train

        fea_left, fea_right = self._extract(left, right)
        head = self.matcher.head(jnp.concatenate([fea_left, fea_right], axis=0))
        q_l, q_r = jnp.split(self.matcher.query(head), 2, axis=0)
        k_l, k_r = jnp.split(self.matcher.key(head), 2, axis=0)

        warped_v, mask_l, _, pam = chunked_parallax_train(
            q_l,
            k_l,
            q_r,
            k_r,
            self.matcher.value(fea_right),
            left,
            right,
            scale=1.0 / self.channels,
            chunk=chunk,
        )
        corrected = self.transfer(
            jnp.concatenate(
                [fea_left, warped_v, mask_l.astype(fea_left.dtype)], axis=-1
            )
        )
        return jnp.clip(corrected.astype(jnp.float32), 0.0, 1.0), pam


def compute_losses(model_out, batch):
    """The reference's training objective (reference methods/dcmcs3di.py:68-92).

    Returns (total_loss, dict of scalars). ``batch`` holds NHWC 'gt',
    'target', 'reference'.
    """
    corrected_left, (att, att_cycle, valid_mask, _) = model_out
    gt = batch["gt"]

    loss_l1 = jnp.mean(jnp.abs(corrected_left - gt))
    loss_mse = jnp.mean((corrected_left - gt) ** 2)
    loss_ssim = metrics.ssim_loss(corrected_left, gt, window_size=11)

    loss_pm = 0.005 * pasm.loss_pam_photometric(
        batch["target"], batch["reference"], att, valid_mask
    )
    loss_cycle = 0.005 * pasm.loss_pam_cycle(att_cycle, valid_mask)
    loss_smooth = 0.005 * pasm.loss_pam_smoothness(att)

    total = loss_l1 + loss_mse + loss_ssim + loss_pm + loss_cycle + loss_smooth
    return total, {
        "L1 Loss": loss_l1,
        "MSE Loss": loss_mse,
        "SSIM Loss": loss_ssim,
        "Photometric Loss": loss_pm,
        "Cycle Loss": loss_cycle,
        "Smoothness Loss": loss_smooth,
    }


def compute_losses_fused(corrected_left, pam_losses, batch):
    """Loss assembly for the fused_train_forward path: same reference
    objective (methods/dcmcs3di.py:68-92) with the PAM scalars pre-reduced
    inside the chunked matcher."""
    gt = batch["gt"]

    loss_l1 = jnp.mean(jnp.abs(corrected_left - gt))
    loss_mse = jnp.mean((corrected_left - gt) ** 2)
    loss_ssim = metrics.ssim_loss(corrected_left, gt, window_size=11)

    loss_pm = 0.005 * pam_losses["photometric"]
    loss_cycle = 0.005 * pam_losses["cycle"]
    loss_smooth = 0.005 * pam_losses["smoothness"]

    total = loss_l1 + loss_mse + loss_ssim + loss_pm + loss_cycle + loss_smooth
    return total, {
        "L1 Loss": loss_l1,
        "MSE Loss": loss_mse,
        "SSIM Loss": loss_ssim,
        "Photometric Loss": loss_pm,
        "Cycle Loss": loss_cycle,
        "Smoothness Loss": loss_smooth,
    }
