"""End-to-end numerical parity of the Flax deep rewrites against the
reference's torch code run as an oracle.

The reference's runnable torch modules (/root/reference/unimatch/*.py,
/root/reference/pasmnet/*.py) are instantiated with RANDOM weights, converted
with the production converters (tools/convert_gmflow.py,
tools/convert_checkpoints.py), and their forward outputs compared
element-wise. This validates every layout convention the real weight ports
rely on (SURVEY.md §7 hard part #1) without the unavailable pretrained
checkpoints.

DMSCT's trainable corrector (segmentation_models_pytorch encoder/decoder,
reference methods/dmsct.py:34-56) has no oracle in this image (smp /
efficientnet-pytorch not installed); its matcher half is covered by the
GMFlow tests here and its converter by the structural round-trip tests in
test_convert_checkpoints.py.

The reference tree is imported read-only: ``sys.dont_write_bytecode`` is set
so no __pycache__ is written into /root/reference.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference repo not present"
)


@pytest.fixture(scope="module")
def ref_path():
    had_flag = sys.dont_write_bytecode
    sys.dont_write_bytecode = True  # never write __pycache__ into /root/reference
    sys.path.insert(0, str(REFERENCE))
    torch.manual_seed(0)
    yield REFERENCE
    sys.path.remove(str(REFERENCE))
    sys.dont_write_bytecode = had_flag


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy())


def _nhwc(x_nchw_t):
    return jnp.asarray(np.moveaxis(x_nchw_t.detach().numpy(), 1, -1))


# ---------------------------------------------------------------------------
# GMFlow / UniMatch
# ---------------------------------------------------------------------------

GMFLOW_LAYERS = 2  # reduced depth: same structure per layer, CPU-friendly
GMFLOW_REFINE = 2


@pytest.fixture(scope="module")
def gmflow_pair(ref_path):
    """(torch UniMatch, converted flax params) with random weights."""
    from unimatch.unimatch import UniMatch

    tm = UniMatch(
        num_scales=2,
        feature_channels=128,
        upsample_factor=4,
        num_head=1,
        ffn_dim_expansion=4,
        num_transformer_layers=GMFLOW_LAYERS,
        reg_refine=True,
        task="flow",
    )
    tm.eval()

    from color_transfer_tpu.tools.convert_gmflow import convert_state_dict

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, num_layers=GMFLOW_LAYERS)
    return tm, params


def test_gmflow_core_forward_parity(gmflow_pair):
    """Random-weight torch UniMatch (reference unimatch/unimatch.py:98-370)
    vs the Flax rewrite, full pipeline: CNN encoder -> swin transformer ->
    global/local correlation -> self-attn propagation -> GRU refinements ->
    convex upsampling."""
    from color_transfer_tpu.models.gmflow import UniMatchFlow

    tm, params = gmflow_pair
    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        res = tm(
            _nchw(img0),
            _nchw(img1),
            attn_type="swin",
            attn_splits_list=[2, 8],
            corr_radius_list=[-1, 4],
            prop_radius_list=[-1, 1],
            num_reg_refine=GMFLOW_REFINE,
            task="flow",
        )
    flow_t = _nhwc(res["flow_preds"][-1])

    # corr_dtype=f32: these tests check the rewrite's math bit-strictly
    # against torch; the bf16 default is a perf knob verified separately.
    model = UniMatchFlow(
        num_transformer_layers=GMFLOW_LAYERS, corr_dtype=jnp.float32
    )
    flow_j = model.apply(
        {"params": params["core"]},
        jnp.asarray(img0),
        jnp.asarray(img1),
        num_reg_refine=GMFLOW_REFINE,
    )

    assert flow_j.shape == flow_t.shape
    diff = float(jnp.max(jnp.abs(flow_j - flow_t)))
    scale = float(jnp.max(jnp.abs(flow_t))) + 1e-6
    assert diff < max(2e-3, 1e-3 * scale), f"flow mismatch: max|Δ|={diff}, max|flow|={scale}"


def test_gmflow_core_bidir_parity(gmflow_pair):
    """Bidirectional flow: the reference interleaves fwd/bwd along batch and
    de-interleaves with [::2] (reference unimatch/__init__.py:138,:150); the
    rewrite uses block layout [fwd x B, bwd x B]. Outputs must agree."""
    from color_transfer_tpu.models.gmflow import UniMatchFlow

    tm, params = gmflow_pair
    rng = np.random.default_rng(1)
    img0 = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        res = tm(
            _nchw(img0),
            _nchw(img1),
            attn_type="swin",
            attn_splits_list=[2, 8],
            corr_radius_list=[-1, 4],
            prop_radius_list=[-1, 1],
            num_reg_refine=GMFLOW_REFINE,
            pred_bidir_flow=True,
            task="flow",
        )
    flow_pr = res["flow_preds"][-1]  # (2B, 2, H, W) fwd/bwd interleaved
    fwd_t, bwd_t = _nhwc(flow_pr[0::2]), _nhwc(flow_pr[1::2])

    # corr_dtype=f32: these tests check the rewrite's math bit-strictly
    # against torch; the bf16 default is a perf knob verified separately.
    model = UniMatchFlow(
        num_transformer_layers=GMFLOW_LAYERS, corr_dtype=jnp.float32
    )
    flow_j = model.apply(
        {"params": params["core"]},
        jnp.asarray(img0),
        jnp.asarray(img1),
        num_reg_refine=GMFLOW_REFINE,
        pred_bidir_flow=True,
    )
    fwd_j, bwd_j = flow_j[:1], flow_j[1:]

    for got, want, name in [(fwd_j, fwd_t, "fwd"), (bwd_j, bwd_t, "bwd")]:
        diff = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        assert diff < max(2e-3, 1e-3 * scale), f"{name} flow mismatch: {diff} vs {scale}"


def test_gmflow_wrapper_protocol_parity(gmflow_pair):
    """The full inference wrapper protocol — resize to inference size, flow
    rescale, bidirectional split, fwd/bwd occlusion check (reference
    unimatch/__init__.py:60-167) — against the reference GMFlow.forward run
    on the same random-weight core (constructed without the checkpoint
    download via __new__)."""
    import unimatch as ref_unimatch
    from unimatch.unimatch import UniMatch
    from color_transfer_tpu.models.gmflow import GMFlow

    tm, params = gmflow_pair

    wrapper = ref_unimatch.GMFlow.__new__(ref_unimatch.GMFlow)
    UniMatch.__init__(
        wrapper,
        num_scales=2,
        feature_channels=128,
        upsample_factor=4,
        num_head=1,
        ffn_dim_expansion=4,
        num_transformer_layers=GMFLOW_LAYERS,
        reg_refine=True,
        task="flow",
    )
    wrapper.load_state_dict(tm.state_dict())
    wrapper.eval()

    rng = np.random.default_rng(2)
    # Non-multiple-of-32 size exercises the resize + flow-rescale path.
    img0 = rng.uniform(0, 255, (1, 48, 80, 3)).astype(np.float32)
    img1 = rng.uniform(0, 255, (1, 48, 80, 3)).astype(np.float32)

    with torch.no_grad():
        out_t = wrapper(
            _nchw(img0),
            _nchw(img1),
            num_reg_refine=GMFLOW_REFINE,
            pred_bidir_flow=True,
            fwd_bwd_consistency_check=True,
        )

    model = GMFlow(
        num_transformer_layers=GMFLOW_LAYERS, num_reg_refine=GMFLOW_REFINE,
        corr_dtype=jnp.float32,
    )
    out_j = model.apply(
        {"params": {"core": params["core"]}}, jnp.asarray(img0), jnp.asarray(img1)
    )

    flow_t = _nhwc(out_t["flow"])
    diff = float(jnp.max(jnp.abs(out_j["flow"] - flow_t)))
    scale = float(jnp.max(jnp.abs(flow_t))) + 1e-6
    assert diff < max(5e-3, 2e-3 * scale), f"wrapper flow mismatch: {diff} vs {scale}"

    # Occlusion masks are thresholded booleans — tiny numeric drift can flip
    # pixels right at the threshold, so compare by disagreement rate.
    occ_t = out_t["fwd_occ"].detach().numpy()[:, 0]
    occ_j = np.asarray(out_j["fwd_occ"][..., 0])
    disagree = float(np.mean(occ_t != occ_j))
    assert disagree < 0.02, f"fwd occlusion disagreement {disagree:.4f}"


# ---------------------------------------------------------------------------
# DCMCS3DI / PASMnet
# ---------------------------------------------------------------------------


def _torch_dcmcs3di(ref_path, extraction_layers, transfer_layers, channels):
    """The reference DCMCS3DI network graph (methods/dcmcs3di.py:41-66)
    rebuilt from its pasmnet components — the LightningModule itself cannot
    be imported here (pytorch_lightning is not installed), so the Sequential
    stacks are reconstructed to its published architecture."""
    from pasmnet.attention import PAB
    from pasmnet.backbone import ResB
    from pasmnet.utils import output, warp

    class TorchDCMCS3DI(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.extraction = torch.nn.Sequential(
                torch.nn.Conv2d(3, channels, kernel_size=3, padding=1)
            )
            for _ in range(extraction_layers):
                self.extraction.append(ResB(channels, channels))
            self.matcher = PAB(channels)
            self.transfer = torch.nn.Sequential(
                torch.nn.Conv2d(2 * channels + 1, channels, kernel_size=1)
            )
            for _ in range(transfer_layers):
                self.transfer.append(ResB(channels, channels))
            self.transfer.append(
                torch.nn.Conv2d(channels, channels // 2, kernel_size=3, padding=1)
            )
            self.transfer.append(
                torch.nn.Conv2d(channels // 2, 3, kernel_size=3, padding=1)
            )

        def forward(self, left, right, inference=False):
            fea_left = self.extraction(left)
            fea_right = self.extraction(right)
            att, att_cycle, valid_mask = output(
                self.matcher(fea_left, fea_right), inference
            )
            fea_warped_right = warp(self.matcher.value(fea_right), att[0])
            corrected = self.transfer(
                torch.cat([fea_left, fea_warped_right, valid_mask[0]], dim=1)
            )
            return corrected.clamp(0, 1), (att, att_cycle, valid_mask,
                                           warp(right, att[0]))

    return TorchDCMCS3DI()


@pytest.fixture(scope="module")
def dcmcs3di_pair(ref_path):
    ext_l, tr_l, ch = 3, 2, 16
    tm = _torch_dcmcs3di(ref_path, ext_l, tr_l, ch)
    tm.eval()

    from color_transfer_tpu.tools.convert_checkpoints import convert_dcmcs3di

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_dcmcs3di(sd, extraction_layers=ext_l, transfer_layers=tr_l)
    return tm, params, (ext_l, tr_l, ch)


def test_dcmcs3di_forward_parity(dcmcs3di_pair):
    """Random-weight torch DCMCS3DI vs the Flax rewrite: extractor -> PAB
    cost volumes -> masked softmax -> attention warp -> transfer net, with
    all four aux outputs (reference methods/dcmcs3di.py:53-66)."""
    from color_transfer_tpu.models.dcmcs3di import DCMCS3DI

    tm, params, (ext_l, tr_l, ch) = dcmcs3di_pair
    rng = np.random.default_rng(3)
    left = rng.uniform(0, 1, (2, 24, 40, 3)).astype(np.float32)
    right = rng.uniform(0, 1, (2, 24, 40, 3)).astype(np.float32)

    with torch.no_grad():
        out_t, (att_t, att_cycle_t, valid_t, warped_t) = tm(
            _nchw(left), _nchw(right)
        )

    model = DCMCS3DI(extraction_layers=ext_l, transfer_layers=tr_l, channels=ch)
    out_j, (att_j, att_cycle_j, valid_j, warped_j) = model.apply(
        {"params": params}, jnp.asarray(left), jnp.asarray(right)
    )

    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(att_j[0]), att_t[0].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(att_cycle_j[0]), att_cycle_t[0].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(warped_j), warped_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
    )
    # Valid masks are thresholded; require exact agreement away from the
    # threshold and <1% disagreement overall.
    vm_t = valid_t[0].numpy()[:, 0]
    vm_j = np.asarray(valid_j[0][..., 0]) if valid_j[0].ndim == 4 else np.asarray(valid_j[0])
    assert vm_j.shape == vm_t.shape
    assert float(np.mean(vm_t != vm_j)) < 0.01


def test_dcmcs3di_pam_loss_parity(dcmcs3di_pair):
    """The PAM loss stack (reference pasmnet/losses.py:10-46) computed by the
    torch reference on its own forward vs the rewrite's compute_losses parts
    on the converted model."""
    from pasmnet.losses import (
        loss_pam_photometric,
        loss_pam_cycle,
        loss_pam_smoothness,
    )
    from color_transfer_tpu.models.dcmcs3di import DCMCS3DI, compute_losses

    tm, params, (ext_l, tr_l, ch) = dcmcs3di_pair
    rng = np.random.default_rng(4)
    gt = rng.uniform(0, 1, (1, 24, 40, 3)).astype(np.float32)
    target = np.clip(gt * 1.1, 0, 1).astype(np.float32)
    reference = rng.uniform(0, 1, (1, 24, 40, 3)).astype(np.float32)

    with torch.no_grad():
        t_target, t_ref = _nchw(target), _nchw(reference)
        out_t, (att_t, att_cycle_t, valid_t, _) = tm(t_target, t_ref)
        pm_t = 0.005 * loss_pam_photometric(t_target, t_ref, att_t, valid_t)
        cyc_t = 0.005 * loss_pam_cycle(att_cycle_t, valid_t)
        sm_t = 0.005 * loss_pam_smoothness(att_t)
        l1_t = torch.nn.functional.l1_loss(out_t, _nchw(gt))
        mse_t = torch.nn.functional.mse_loss(out_t, _nchw(gt))

    model = DCMCS3DI(extraction_layers=ext_l, transfer_layers=tr_l, channels=ch)
    batch = {
        "gt": jnp.asarray(gt),
        "target": jnp.asarray(target),
        "reference": jnp.asarray(reference),
    }
    out_j = model.apply({"params": params}, batch["target"], batch["reference"])
    _, parts = compute_losses(out_j, batch)

    np.testing.assert_allclose(float(parts["Photometric Loss"]), float(pm_t), atol=1e-6)
    np.testing.assert_allclose(float(parts["Cycle Loss"]), float(cyc_t), atol=1e-6)
    np.testing.assert_allclose(float(parts["Smoothness Loss"]), float(sm_t), atol=1e-6)
    np.testing.assert_allclose(float(parts["L1 Loss"]), float(l1_t), atol=1e-6)
    np.testing.assert_allclose(float(parts["MSE Loss"]), float(mse_t), atol=1e-6)
