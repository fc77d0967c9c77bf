"""DMSCT warp-stage split @1080p by in-program ablation (round 5).

The round-5 corrector ablation (prof_corrector_ablate_r4.py) attributed
58.8 ms of the 270 ms bf16-recipe serving step to "warps+resizes" — more
than decoder+both encoders combined. This splits that term:

  full         — reference forward (prof_corrector_ablate_r4 'full')
  warp_id      — flow_warp_batched -> identity (resizes kept)
  no_l0_warp   — only the FULL-RES level-0 (3-channel image) warp skipped
  slice_occ    — occ pyramid via strided slice instead of gathered
                 resize_nearest (bit-identical for exact integer factors)

Run with PROF_DTYPE=f32 for the gated bit-strict configuration's numbers
(the warp always runs f32, so its cost is recipe-independent).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from color_transfer_tpu.core.resize import (
    derive_matcher_size,
    resize_nearest,
    upsample_flow_bilinear,
)
from color_transfer_tpu.core.sampling import flow_warp_batched
from color_transfer_tpu.models.dmsct import DMSCT

print("backend:", jax.default_backend(), flush=True)

H = int(os.environ.get("PROF_H", "1080"))
W = int(os.environ.get("PROF_W", "1920"))
BF16 = os.environ.get("PROF_DTYPE", "bf16") != "f32"

model = DMSCT(
    **(
        dict(
            matcher_corr_dtype="bfloat16",
            matcher_compute_dtype="bfloat16",
            corrector_compute_dtype="bfloat16",
        )
        if BF16
        else {}
    )
)
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (1, H, W, 3))
r = jnp.clip(t * 0.95 + 0.01, 0, 1)
params = model.init(
    {"params": key, "dropout": jax.random.PRNGKey(1)},
    t[:, :64, :64],
    r[:, :64, :64],
)


def forward(m, target, reference, *, warp_mode="full", occ_mode="gather"):
    b, height, width, _ = target.shape
    matcher_size = derive_matcher_size(
        height, width, max_area=m.matcher_max_area
    )
    matcher_out = m.matcher(
        target * 255.0,
        reference * 255.0,
        pred_bidir_flow=True,
        fwd_bwd_consistency_check=True,
        inference_size=matcher_size,
    )
    flow = jax.lax.stop_gradient(matcher_out["flow"])
    fwd_occ = jax.lax.stop_gradient(matcher_out["fwd_occ"])

    factor = 2**m.encoder_depth
    pad_h = (-height) % factor
    pad_w = (-width) % factor

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")

    flow = pad(flow)
    not_occ = pad(1.0 - fwd_occ)

    features_target = m.encoder(pad(target))
    features_reference = m.encoder(pad(reference))

    features = []
    for idx, (feat_t, feat_r) in enumerate(
        zip(features_target, features_reference)
    ):
        feat_t = feat_t.astype(jnp.float32)
        feat_r = feat_r.astype(jnp.float32)
        flow_idx = upsample_flow_bilinear(flow, 2.0**-idx) if idx else flow
        skip = warp_mode == "none" or (warp_mode == "no_l0" and idx == 0)
        warped = feat_r if skip else flow_warp_batched(feat_r, flow_idx)
        if idx == 0:
            occ_idx = not_occ
        elif occ_mode == "slice":
            f = 2**idx
            occ_idx = not_occ[:, ::f, ::f, :]
        else:
            occ_idx = jnp.moveaxis(
                resize_nearest(
                    jnp.moveaxis(not_occ, -1, 1), flow_idx.shape[1:3]
                ), 1, -1,
            )
        features.append(jnp.concatenate([feat_t, warped, occ_idx], axis=-1))

    residual = m.head(m.decoder(*features)).astype(jnp.float32)
    corrected = target + residual[:, :height, :width, :]
    return jnp.clip(corrected, 0.0, 1.0)


def ms(tag, iters=6, **flags):
    fwd = jax.jit(
        lambda v, a, b: model.apply(
            v, a, b, method=lambda m, x, y: forward(m, x, y, **flags)
        )
    )
    out = fwd(params, t, r)
    assert np.isfinite(float(out.mean()))
    acc = t
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, r)
    assert np.isfinite(float(acc.mean()))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {dt:.1f} ms", flush=True)
    return dt


dt_name = "bf16-recipe" if BF16 else "f32"
full = ms(f"full ({dt_name})")
warp_id = ms("warp_id (all warps skipped)", warp_mode="none")
no_l0 = ms("no_l0_warp (only fullres L0 warp skipped)", warp_mode="no_l0")
slice_occ = ms("slice_occ (strided occ pyramid)", occ_mode="slice")
print(
    f"attribution: all warps {full - warp_id:.1f} | L0 warp alone "
    f"{full - no_l0:.1f} | occ gather resize {full - slice_occ:.1f}",
    flush=True,
)
