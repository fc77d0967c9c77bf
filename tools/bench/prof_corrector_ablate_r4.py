"""DMSCT corrector floor, attributed by IN-PROGRAM ablation (roofline
methodology: standalone sub-stage jits measure pathologically through the
tunnel — the standalone encoder/decoder/warp sum is ~2.7x the full model's
measured step, so marginal deltas inside the FULL program are the only
trustworthy attribution).

Variants (each a full jitted forward, bf16 recipe, 1080p b1):
  full         — the bench_dmsct(recipe=True) program
  no_decoder   — decoder+head replaced by a mean over the pyramid
  no_warps     — flow_warp + per-level flow/occ resizes replaced by feat_r
  one_encoder  — reference features aliased to target features
  no_matcher   — matcher replaced by constant flow/occ
Marginal delta full-variant = that stage's in-program cost.
"""
import os
import time

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

model = DMSCT(
    matcher_corr_dtype="bfloat16",
    matcher_compute_dtype="bfloat16",
    corrector_compute_dtype="bfloat16",
)
key = jax.random.PRNGKey(0)
t = jax.random.uniform(key, (1, H, W, 3))
r = jnp.clip(t * 0.95 + 0.01, 0, 1)
params = model.init(
    {"params": key, "dropout": jax.random.PRNGKey(1)},
    t[:, :64, :64],
    r[:, :64, :64],
)


def forward(m, target, reference, *, decoder=True, warps=True,
            two_encoders=True, matcher=True):
    b, height, width, _ = target.shape
    if matcher:
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
    else:
        flow = jnp.ones((b, height, width, 2), jnp.float32) * reference[..., :2]
        fwd_occ = (target[..., :1] > 0.5).astype(jnp.float32)

    factor = 2**m.encoder_depth
    pad_h = (-height) % factor
    pad_w = (-width) % factor

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")

    flow = pad(flow)
    not_occ = pad(1.0 - fwd_occ)

    features_target = m.encoder(pad(target))
    features_reference = (
        m.encoder(pad(reference)) if two_encoders
        else [f * 0.5 for f in features_target]
    )

    features = []
    for idx, (feat_t, feat_r) in enumerate(
        zip(features_target, features_reference)
    ):
        feat_t = feat_t.astype(jnp.float32)
        feat_r = feat_r.astype(jnp.float32)
        if warps:
            flow_idx = upsample_flow_bilinear(flow, 2.0**-idx) if idx else flow
            warped = flow_warp_batched(feat_r, flow_idx)
            occ_idx = (
                jnp.moveaxis(
                    resize_nearest(
                        jnp.moveaxis(not_occ, -1, 1), flow_idx.shape[1:3]
                    ), 1, -1,
                )
                if idx else not_occ
            )
        else:
            warped = feat_r
            occ_idx = feat_r[..., :1] + not_occ.mean()
        features.append(jnp.concatenate([feat_t, warped, occ_idx], axis=-1))

    if decoder:
        residual = m.head(m.decoder(*features)).astype(jnp.float32)
        corrected = target + residual[:, :height, :width, :]
        return jnp.clip(corrected, 0.0, 1.0)
    # touch every pyramid level so nothing is dead-code-eliminated
    acc = jnp.zeros((), jnp.float32)
    for f in features:
        acc = acc + jnp.mean(f.astype(jnp.float32))
    return target[:, :height, :width, :] * 0.0 + acc


def ms(tag, iters=6, **flags):
    fwd = jax.jit(
        lambda v, a, b: model.apply(v, a, b, method=lambda m, x, y: forward(m, x, y, **flags))
    )
    out = fwd(params, t, r)
    float(jnp.asarray(out).ravel()[0])
    acc = t
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fwd(params, acc, r)
    float(jnp.asarray(acc).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {dt:.1f} ms", flush=True)
    return dt


full = ms("full (recipe)")
nodec = ms("no_decoder", decoder=False)
nowarp = ms("no_warps", warps=False)
oneenc = ms("one_encoder", two_encoders=False)
nomat = ms("no_matcher", matcher=False)
print(
    f"attribution: decoder+head {full - nodec:.1f} | warps+resizes "
    f"{full - nowarp:.1f} | 2nd encoder {full - oneenc:.1f} | matcher "
    f"{full - nomat:.1f} | residual(1 enc + pads + clip) "
    f"{full - (full - nodec) - (full - nowarp) - (full - oneenc) - (full - nomat):.1f}",
    flush=True,
)
