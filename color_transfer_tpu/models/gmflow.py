"""GMFlow / UniMatch optical-flow matcher in Flax (NHWC, TPU-first).

Re-design of the reference's vendored unimatch (reference unimatch/*.py,
config: 2 scales, 128 channels, upsample x4, 6 transformer layers, 6 GRU
refinements — reference unimatch/__init__.py:18-27). Used frozen inside DMSCT
(reference methods/dmsct.py:30-32). Key re-design decisions:

  * channel-last everywhere; attention as einsum contractions on the MXU;
  * the swin shifted-window masks are built in numpy at trace time from the
    static feature shape (the reference builds them per forward on device,
    unimatch/transformer.py:248-269);
  * the 6-step GRU refinement is a python loop over static iterations
    (weights shared; XLA unrolls — a lax.scan would re-trace the same body);
  * bidirectional flow: batch-block layout [forward x B, backward x B]. The
    reference wrapper de-interleaves with [::2] (unimatch/__init__.py:138),
    which is only correct for B == 1 given the block-concat construction in
    unimatch/matching.py:27; this implementation splits at B which is correct
    for every batch size.

Weight porting: tools/convert_gmflow.py maps the published torch checkpoint
onto these module names one-to-one.
"""

import functools
import math
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from color_transfer_tpu.core.resize import resize_bilinear
from color_transfer_tpu.core.sampling import (
    coords_grid,
    grid_sample,
    flow_warp,
    forward_backward_consistency,
)
from color_transfer_tpu.ops.win_attention import (
    eligible as win_eligible,
    ffn_eligible,
    ffn_fused,
    layer_norm,
    shift_window_mask as _shift_window_mask,
    window_attention_fused,
    window_sublayer_fused,
)

# ---------------------------------------------------------------------------
# CNN encoder (reference unimatch/backbone.py)
# ---------------------------------------------------------------------------


class _InstanceNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # Statistics in f32 regardless of the compute dtype: per-image
        # mean/var over H*W positions loses precision fast in bf16.
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)
        var = xf.var(axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_InstanceNorm(name="norm1")(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_InstanceNorm(name="norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample_conv")(x)
            x = _InstanceNorm(name="norm3")(x)
        return nn.relu(x + y)


class CNNEncoder(nn.Module):
    """RAFT-style encoder emitting 2 scales (1/8 and 1/4) via a shared-weight
    trident conv (reference unimatch/backbone.py:42-120).

    dtype: computation dtype (params stay f32); bf16 halves conv HBM
    traffic — gate with the mini 31-distortion protocol before enabling."""

    output_dim: int = 128
    num_output_scales: int = 2
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_InstanceNorm(name="norm1")(x))

        x = ResidualBlock(64, 1, dtype=self.dtype, name="layer1_0")(x)
        x = ResidualBlock(64, 1, dtype=self.dtype, name="layer1_1")(x)
        x = ResidualBlock(96, 2, dtype=self.dtype, name="layer2_0")(x)
        x = ResidualBlock(96, 1, dtype=self.dtype, name="layer2_1")(x)
        stride3 = 2 if self.num_output_scales == 1 else 1
        x = ResidualBlock(128, stride3, dtype=self.dtype, name="layer3_0")(x)
        x = ResidualBlock(128, 1, dtype=self.dtype, name="layer3_1")(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)

        if self.num_output_scales > 1:
            # Shared 3x3 weight applied at strides (1, 2)
            # (reference unimatch/trident_conv.py:64-90).
            kernel = self.param(
                "trident_kernel",
                nn.initializers.kaiming_normal(),
                (3, 3, self.output_dim, self.output_dim),
            )
            outs = []
            for stride in (1, 2):
                outs.append(
                    jax.lax.conv_general_dilated(
                        x, kernel.astype(x.dtype), (stride, stride),
                        [(1, 1), (1, 1)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
            return outs  # high to low res: [1/8-at-stride1 ... ] per reference
        return [x]


# ---------------------------------------------------------------------------
# Position embedding (reference unimatch/position.py)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _sine_position(h, w, num_pos_feats=64, temperature=10000, scale=2 * math.pi):
    """DETR sine embedding on an all-ones mask, numpy, (H, W, 2*num)."""
    y_embed = np.cumsum(np.ones((h, w)), axis=0)
    x_embed = np.cumsum(np.ones((h, w)), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1
                     ).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1
                     ).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


def feature_add_position(feature0, feature1, attn_splits, channels):
    """Add the sine embedding per split window (reference unimatch/utils.py:114-134)."""
    b, h, w, c = feature0.shape
    if attn_splits > 1:
        hs, ws = h // attn_splits, w // attn_splits
        pos_small = jnp.asarray(_sine_position(hs, ws, channels // 2))
        pos = jnp.tile(pos_small, (attn_splits, attn_splits, 1))
    else:
        pos = jnp.asarray(_sine_position(h, w, channels // 2))
    pos = pos.astype(feature0.dtype)  # keep a bf16 compute path bf16
    return feature0 + pos, feature1 + pos


# ---------------------------------------------------------------------------
# Swin window helpers (reference unimatch/utils.py:37-111)
# ---------------------------------------------------------------------------


def split_windows(x, k):
    """(B, H, W, C) -> (B*k*k, H/k, W/k, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)


def merge_windows(x, k):
    bk, hs, ws, c = x.shape
    b = bk // (k * k)
    x = x.reshape(b, k, k, hs, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, k * hs, k * ws, c)


# _shift_window_mask lives in ops/win_attention.py (shift_window_mask) so
# the fused kernel's VJP can rebuild it without an import cycle.


def _attention(q, k, v, mask=None):
    """Scaled softmax attention over flattened tokens: (B, L, C) each.

    Scores accumulate in f32 and the softmax runs in f32 regardless of the
    operand dtype (bf16 operands keep MXU throughput; f32 softmax keeps the
    normalization exact). Identity for f32 inputs."""
    c = q.shape[-1]
    scores = jnp.einsum(
        "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(c)
    if mask is not None:
        scores = scores + mask
    prob = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "blm,bmc->blc", prob, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def swin_attention(q, k, v, num_splits, with_shift, h, w):
    """Split-window attention with optional swin shift
    (reference unimatch/attention.py:48-107).

    q/k/v ride one channel-concatenated tensor through the roll and the
    6D window transpose — the window split is a purely spatial transform,
    so one 3C-wide pass replaces three C-wide passes of HBM traffic."""
    b, _, c = q.shape
    q = q.reshape(b, h, w, c)
    k = k.reshape(b, h, w, c)
    v = v.reshape(b, h, w, c)

    if num_splits <= 1:
        return _attention(
            q.reshape(b, h * w, c), k.reshape(b, h * w, c), v.reshape(b, h * w, c)
        )

    hs, ws = h // num_splits, w // num_splits
    mask = None
    qkv = jnp.concatenate([q, k, v], axis=-1)
    if with_shift:
        qkv = jnp.roll(qkv, (-(hs // 2), -(ws // 2)), axis=(1, 2))
        mask = jnp.tile(jnp.asarray(_shift_window_mask(h, w, num_splits)), (b, 1, 1))

    qkvw = split_windows(qkv, num_splits).reshape(-1, hs * ws, 3 * c)
    qw, kw, vw = jnp.split(qkvw, 3, axis=-1)

    out = _attention(qw, kw, vw, mask)
    out = merge_windows(out.reshape(-1, hs, ws, c), num_splits)
    if with_shift:
        out = jnp.roll(out, (hs // 2, ws // 2), axis=(1, 2))
    return out.reshape(b, h * w, c)


# ---------------------------------------------------------------------------
# Feature transformer (reference unimatch/transformer.py)
# ---------------------------------------------------------------------------


class TransformerLayer(nn.Module):
    d_model: int = 128
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    dtype: jnp.dtype = None
    # Route eligible windowed attention through the fused Pallas kernels
    # (ops/win_attention.py): "auto" (default — fuse exactly when the
    # compute dtype is bfloat16), False, True (TPU only; silently falls
    # back to XLA on other backends), or "interpret" (tests).
    #
    # Why dtype-aware (measured v5e A/B, PERF.md round-3): in-kernel f32
    # dots need Precision.HIGHEST (6 MXU passes) while XLA lowers default
    # "f32" matmuls to one-pass bf16, so the fused f32 path loses (294.6 vs
    # 224.1 ms at the scale1 train shape); bf16 operands are exact in one
    # pass and the fused path wins big (155.8 vs 197.5 ms; 16.5 vs 28.9 at
    # scale0).
    fused_attention: object = "auto"

    @nn.compact
    def __call__(self, source, target, h, w, with_shift, attn_num_splits,
                 attn_type="swin", *, is_self, windowed=False, win_mask=None):
        # is_self is keyword-required: the fused projections compute K/V
        # from `source` when True and from `target` when False, so a caller
        # silently inheriting a default would get wrong attention, not an
        # error.
        #
        # windowed=True: the caller already holds tokens in window-major
        # layout (B*k*k, hs*ws, C) — attention runs directly per window
        # (win_mask is the additive shifted-window mask, or None), skipping
        # the per-layer split/merge transforms. Parameters and per-token
        # math are identical to the non-windowed path.
        init = nn.initializers.xavier_uniform()

        # q/k/v projections as explicit params with the same tree layout a
        # nn.Dense child would produce ({"q_proj": {"kernel": ...}}), so the
        # torch converter mapping is unchanged — but fused at apply time:
        # self-attention runs ONE (L,C)@(C,3C) dot instead of three
        # (L,C)@(C,C) dots (one read of the activations instead of three;
        # small-shape dispatch overhead amortized 3x), cross-attention fuses
        # k/v into a (C,2C) dot. Column blocks of a matmul are independent,
        # so the fused dots are numerically identical to the separate ones.
        c_in = source.shape[-1]

        def _proj(name, in_dim=None):
            return self.param(
                name,
                lambda key: {
                    "kernel": init(key, (in_dim or c_in, self.d_model))
                },
            )["kernel"]

        # merge and the LayerNorms are explicit params too (same
        # {"merge": {"kernel"}} / {"norm1": {"scale", "bias"}} trees as the
        # nn.Dense / nn.LayerNorm children they replace) so the fused
        # kernels can take them as operands.
        wq, wk, wv = _proj("q_proj"), _proj("k_proj"), _proj("v_proj")
        wm = _proj("merge", in_dim=self.d_model)

        def _norm_params(name):
            d = self.d_model
            p = self.param(
                name,
                lambda key: {
                    "scale": jnp.ones((d,), jnp.float32),
                    "bias": jnp.zeros((d,), jnp.float32),
                },
            )
            return p["scale"], p["bias"]

        n1_scale, n1_bias = _norm_params("norm1")

        def _cast(x):
            return x if self.dtype is None else x.astype(self.dtype)

        def _dot(x, w):
            return _cast(x) @ _cast(w)

        # Fused whole-sublayer path: q/kv projections + windowed attention
        # + merge projection in ONE Pallas call with the weights
        # VMEM-resident — one read of the token tensors and one write of
        # the merged message instead of four HBM passes.
        fused = self.fused_attention
        q_shape = (*source.shape[:-1], self.d_model)
        q_dtype = source.dtype if self.dtype is None else self.dtype
        if fused == "auto":
            fused = jnp.dtype(q_dtype) == jnp.bfloat16
        if fused is True and jax.default_backend() != "tpu":
            fused = False  # Mosaic kernels need the TPU backend
        sublayer_fused = (
            windowed
            and fused
            and c_in == self.d_model
            and win_eligible(q_shape, q_dtype, None)
        )
        if sublayer_fused:
            message = window_sublayer_fused(
                _cast(source),
                _cast(source if is_self else target),
                _cast(wq),
                _cast(jnp.concatenate([wk, wv], axis=1)),
                _cast(wm),
                n1_scale,
                n1_bias,
                shift_windows=(
                    (attn_num_splits, h, w) if win_mask is not None else None
                ),
                add_residual=self.no_ffn,
                interpret=fused == "interpret",
            )
            if self.no_ffn:
                # The kernel already emitted source + LN1(sublayer) — the
                # complete no-FFN layer output.
                return message
        elif is_self:
            qkv = _dot(source, jnp.concatenate([wq, wk, wv], axis=1))
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _dot(source, wq)
            kv = _dot(target, jnp.concatenate([wk, wv], axis=1))
            k, v = jnp.split(kv, 2, axis=-1)

        # attn_type routing mirrors reference unimatch/transformer.py:65-138:
        # 'swin' (the flow config) uses 2D shifted windows for both self and
        # cross attention; the stereo variants use 1D cross attention.
        if sublayer_fused:
            pass  # message already holds the merged sublayer output
        elif windowed:
            # win_mask is the SMALL (k*k, L, L) shift mask (or None); the
            # XLA path tiles it, the attention-only fused kernel regenerates
            # it in-kernel from window geometry (h/w are the window dims
            # here) so no mask operand rides in VMEM.
            if fused and win_eligible(q.shape, q.dtype, None):
                message = window_attention_fused(
                    q, k, v,
                    shift_windows=(
                        (attn_num_splits, h, w) if win_mask is not None
                        else None
                    ),
                    interpret=fused == "interpret",
                )
            else:
                mask = win_mask
                if mask is not None:
                    mask = jnp.tile(mask, (q.shape[0] // mask.shape[0], 1, 1))
                message = _attention(q, k, v, mask)
        elif attn_type == "swin" or is_self:
            message = swin_attention(q, k, v, attn_num_splits, with_shift, h, w)
        elif attn_type == "self_swin2d_cross_1d":
            from color_transfer_tpu.models.gmflow_extras import full_attention_1d

            message = full_attention_1d(q, k, v, h, w)
        elif attn_type == "self_swin2d_cross_swin1d":
            from color_transfer_tpu.models.gmflow_extras import (
                full_attention_1d,
                swin_attention_1d,
            )

            if attn_num_splits > 1:
                message = swin_attention_1d(
                    q, k, v, attn_num_splits, with_shift, h, w
                )
            else:
                message = full_attention_1d(q, k, v, h, w)
        else:
            raise ValueError(f"unknown attn_type {attn_type!r}")
        if not sublayer_fused:
            # Merge projection + LayerNorm (the fused kernel already
            # applied both). Identical to the nn.Dense(use_bias=False) /
            # nn.LayerNorm children they replace: same param trees, same
            # cast chains (LN stats in f32, output cast to compute dtype).
            message = _dot(message, wm)
            message = layer_norm(message, n1_scale, n1_bias,
                                 out_dtype=self.dtype)

        if not self.no_ffn:
            # mlp_0/mlp_2/norm2 as explicit params (same trees as the
            # nn.Dense / nn.LayerNorm children they replace) so the fused
            # FFN kernel can take them as operands; the XLA fallback
            # reproduces the children's exact math.
            f_dim = 2 * self.d_model * self.ffn_dim_expansion
            w0 = self.param(
                "mlp_0",
                lambda key: {
                    "kernel": init(key, (c_in + self.d_model, f_dim))
                },
            )["kernel"]
            w2 = self.param(
                "mlp_2",
                lambda key: {"kernel": init(key, (f_dim, self.d_model))},
            )["kernel"]
            n2_scale, n2_bias = _norm_params("norm2")
            if (
                windowed
                and fused
                and c_in == self.d_model
                and ffn_eligible(q_shape, q_dtype, f_dim)
            ):
                # Emits source + LN2(ffn) — the complete layer output.
                return ffn_fused(
                    _cast(source), _cast(message), _cast(w0), _cast(w2),
                    n2_scale, n2_bias, add_residual=True,
                    interpret=fused == "interpret",
                )
            y = jnp.concatenate([source, message], axis=-1)
            y = nn.gelu(_dot(y, w0), approximate=False)
            message = _dot(y, w2)
            message = layer_norm(message, n2_scale, n2_bias,
                                 out_dtype=self.dtype)
        return source + message


class TransformerBlock(nn.Module):
    """self-attn (no FFN) + cross-attn + FFN (reference transformer.py:150-203)."""

    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: jnp.dtype = None
    fused_attention: object = "auto"  # see TransformerLayer.fused_attention

    @nn.compact
    def __call__(self, source, target, h, w, with_shift, attn_num_splits,
                 attn_type="swin", windowed=False, win_mask=None):
        source = TransformerLayer(
            self.d_model, no_ffn=True, ffn_dim_expansion=self.ffn_dim_expansion,
            dtype=self.dtype, fused_attention=self.fused_attention,
            name="self_attn",
        )(source, source, h, w, with_shift, attn_num_splits, attn_type,
          is_self=True, windowed=windowed, win_mask=win_mask)
        source = TransformerLayer(
            self.d_model, ffn_dim_expansion=self.ffn_dim_expansion,
            dtype=self.dtype, fused_attention=self.fused_attention,
            name="cross_attn_ffn",
        )(source, target, h, w, with_shift, attn_num_splits, attn_type,
          is_self=False, windowed=windowed, win_mask=win_mask)
        return source


class FeatureTransformer(nn.Module):
    """Six TransformerBlocks over the [f0|f1] / [f1|f0] siamese batch
    (reference unimatch/transformer.py:205-267).

    For the swin path with attn_num_splits > 1 the stack runs WINDOW-MAJOR:
    tokens live in (2b*k*k, hs*ws, C) layout for all layers, so the
    unshifted layers (0, 2, 4) perform no window split/merge at all and the
    shifted layers (1, 3, 5) cost one merge->roll->split round-trip each —
    versus split+merge inside every attention call (4 spatial transforms
    per layer, with badly aligned (hs, ws) sublane tiles) in the naive
    form. The cross-attention target is derived by a batch-half swap of the
    already-transformed source (the swap commutes with the spatial
    relayout), so it never needs its own round-trip. Per-token math and
    parameters are identical; outputs are bitwise equal to the
    layout-naive path.
    """

    num_layers: int = 6
    d_model: int = 128
    ffn_dim_expansion: int = 4
    dtype: jnp.dtype = None
    # False forces the layout-naive per-layer split/merge path (same params,
    # same outputs) — kept for A/B benching and equivalence tests.
    window_major: bool = True
    fused_attention: object = "auto"  # see TransformerLayer.fused_attention

    @nn.compact
    def __call__(self, feature0, feature1, attn_num_splits, attn_type="swin"):
        b, h, w, c = feature0.shape
        if self.dtype is not None:
            feature0 = feature0.astype(self.dtype)
            feature1 = feature1.astype(self.dtype)

        def _block(i):
            return TransformerBlock(
                self.d_model, self.ffn_dim_expansion, dtype=self.dtype,
                fused_attention=self.fused_attention, name=f"layer_{i}",
            )

        def _swap(x):
            half0, half1 = jnp.split(x, 2, axis=0)
            return jnp.concatenate([half1, half0], axis=0)

        if self.window_major and attn_type == "swin" and attn_num_splits > 1:
            k = attn_num_splits
            hs, ws = h // k, w // k

            def to_win(ximg):  # (2b, h, w, c) -> (2b*k*k, hs*ws, c)
                return split_windows(ximg, k).reshape(-1, hs * ws, c)

            def from_win(xw):  # inverse
                return merge_windows(xw.reshape(-1, hs, ws, c), k)

            # SMALL (k*k, L, L) mask — tiled per window batch only by the
            # XLA attention path; the fused kernel indexes it modularly.
            mask = jnp.asarray(_shift_window_mask(h, w, k))

            concat_img = jnp.concatenate([feature0, feature1], axis=0)
            src = to_win(concat_img)
            for i in range(self.num_layers):
                shifted = i % 2 == 1
                if shifted:
                    src = to_win(
                        jnp.roll(from_win(src), (-(hs // 2), -(ws // 2)),
                                 axis=(1, 2))
                    )
                tgt = _swap(src)
                src = _block(i)(
                    src, tgt, hs, ws,
                    with_shift=shifted,
                    attn_num_splits=k,
                    attn_type=attn_type,
                    windowed=True,
                    win_mask=mask if shifted else None,
                )
                if shifted:
                    src = to_win(
                        jnp.roll(from_win(src), (hs // 2, ws // 2), axis=(1, 2))
                    )
            out = from_win(src)
            f0, f1 = jnp.split(out, 2, axis=0)
            return f0, f1

        concat0 = jnp.concatenate(
            [feature0.reshape(b, h * w, c), feature1.reshape(b, h * w, c)], axis=0
        )
        concat1 = jnp.concatenate(
            [feature1.reshape(b, h * w, c), feature0.reshape(b, h * w, c)], axis=0
        )
        for i in range(self.num_layers):
            concat0 = _block(i)(
                concat0,
                concat1,
                h,
                w,
                with_shift=attn_num_splits > 1 and i % 2 == 1,
                attn_num_splits=attn_num_splits,
                attn_type=attn_type,
            )
            concat1 = _swap(concat0)

        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Correlation / matching (reference unimatch/matching.py)
# ---------------------------------------------------------------------------


def global_correlation_softmax(feature0, feature1, pred_bidir_flow=False):
    """All-pairs correlation -> softmax -> expected coords -> flow
    (reference matching.py:10-39). Bidirectional output is block-concat
    [forward x B, backward x B]."""
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)

    # f32 accumulation + f32 softmax/expectation: the flow stays f32 even
    # when the features ride a bf16 compute path.
    correlation = jnp.einsum(
        "blc,bmc->blm", f0, f1, preferred_element_type=jnp.float32
    ) / math.sqrt(c)

    grid = coords_grid(h, w).reshape(h * w, 2)  # (L, 2)

    if pred_bidir_flow:
        correlation = jnp.concatenate(
            [correlation, correlation.transpose(0, 2, 1)], axis=0
        )
        b = b * 2

    prob = jax.nn.softmax(correlation, axis=-1)
    correspondence = jnp.einsum("blm,mk->blk", prob, grid)
    flow = correspondence.reshape(b, h, w, 2) - grid.reshape(1, h, w, 2)
    return flow, prob


def _window_offsets(radius, dtype=jnp.float32):
    r = jnp.arange(-radius, radius + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox, oy], axis=-1).reshape(-1, 2)  # ((2R+1)^2, 2) as (x, y)


def local_correlation_softmax(feature0, feature1, local_radius):
    """Windowed correlation softmax (reference matching.py:42-86).

    Re-designed memory/compile layout: the window offsets are integers, so
    the (B, H*W, K^2, C) gathered window tensor the reference builds via
    grid_sample (>2 GB at the 1080p matcher cap) is replaced by a
    ``lax.scan`` over K^2 zero-padded dynamic-slice shifts — O(B*H*W*C) live
    memory and a K^2-times smaller HLO than an unrolled loop.
    """
    b, h, w, c = feature0.shape
    coords = coords_grid(h, w)  # (H, W, 2)
    offsets = _window_offsets(local_radius)  # (K2, 2)
    r = local_radius

    padded1 = jnp.pad(feature1, ((0, 0), (r, r), (r, r), (0, 0)))

    def body(_, offset):
        dx = offset[0].astype(jnp.int32)
        dy = offset[1].astype(jnp.int32)
        shifted = jax.lax.dynamic_slice(
            padded1, (0, r + dy, r + dx, 0), (b, h, w, c)
        )
        corr = jnp.einsum(
            "bhwc,bhwc->bhw", feature0, shifted,
            preferred_element_type=jnp.float32,
        )
        x_pos = coords[..., 0] + offset[0]
        y_pos = coords[..., 1] + offset[1]
        valid = (x_pos >= 0) & (x_pos < w) & (y_pos >= 0) & (y_pos < h)
        return None, (corr, valid)

    _, (corr, valid) = jax.lax.scan(body, None, offsets)
    corr = jnp.moveaxis(corr, 0, -1) / math.sqrt(c)  # (B, H, W, K2)
    valid = jnp.moveaxis(valid, 0, -1)  # (H, W, K2)
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)

    sample_coords = coords[:, :, None, :] + offsets  # (H, W, K2, 2)
    correspondence = jnp.einsum("bhwk,hwkt->bhwt", prob, sample_coords)
    return correspondence - coords, prob


def local_correlation_with_flow(
    feature0, feature1, flow, local_radius, corr_dtype=jnp.float32, impl=None
):
    """Windowed correlation at flow-displaced positions, no softmax — feeds
    the GRU refiner (reference matching.py:89-126).

    impl: "pallas" (VMEM-resident patch extraction, see ops/local_corr.py —
    no HBM gather descriptors), "xla" (row-gather scan below), or None to
    pick pallas on TPU. The pallas path carries a custom VJP whose backward
    differentiates the mathematically identical XLA path, so it is safe
    inside value_and_grad (DMSCT's train step traces the frozen matcher
    with parameter tangents; the stop_gradient on the matcher output then
    DCEs the backward, so the frozen case pays nothing — and genuinely
    fine-tuning GMFlow gets correct gradients at XLA-gather speed).

    TPU re-design: all K^2 window positions share one bilinear phase (the
    offsets are integers), so ONE (2r+3)^2-patch gather per pixel fetches the
    whole neighbourhood; the channel dot happens on the patch and the
    fractional-flow interpolation on the resulting correlation grid. 7.5x
    faster than per-offset bilinear gathers on v5e (gathers with large
    contiguous slices amortize the random access), with O(B*H*W*K^2) live
    memory.

    corr_dtype: the gathered features and the channel dot run in this dtype
    (f32 accumulation). Pass jnp.float32 for bit-strict parity checks.

    Gather granularity matters more than gather bytes on TPU: per-row
    (1, k, C) slices need B*HW*k descriptors (~2M at DMSCT's training
    shape, ~50 cycles each -> ~110 ms/iteration). One whole-patch
    (k, k, C) slice per pixel is k fewer descriptors; a scan over pixel
    chunks bounds the gathered buffer to O(B*chunk*k^2*C) (the unchunked
    variant OOMs at training batch sizes).
    """
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        # Kernel schedule (measured on v5e, PERF.md): the MXU variant wins
        # outright for bf16 operands (2.7x at DMSCT's training shape — bf16
        # x bf16 -> f32 is exact one-pass); for f32 it needs multi-pass
        # HIGHEST precision, which only pays off once there are enough
        # pixels to amortize (1.5x at 184k pixels, slightly behind the VPU
        # variant at small batches).
        b, h, w, _ = feature0.shape
        if jnp.dtype(corr_dtype) != jnp.float32 or b * h * w >= 2**17:
            variant = "mxu"
        else:
            variant = "vpu"
        return _local_corr_pallas_ad(
            local_radius, jnp.dtype(corr_dtype), False, variant,
            feature0, feature1, flow,
        )
    return _local_correlation_with_flow_xla(
        feature0, feature1, flow, local_radius, corr_dtype
    )


def _local_correlation_with_flow_xla(
    feature0, feature1, flow, local_radius, corr_dtype
):
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 3  # window plus the +1 bilinear corner on each side
    pad = 2 * r + 4
    coords = coords_grid(h, w)
    base = coords[None] + flow  # (B, H, W, 2)

    # Clamp far-out-of-bounds positions into the all-zeros padding band;
    # within [-(r+2), S+r+1] values are unaffected, beyond it every sampled
    # tap is zero either way (grid_sample zeros-padding semantics).
    bx = jnp.clip(base[..., 0], -(r + 2.0), w + r + 1.0)
    by = jnp.clip(base[..., 1], -(r + 2.0), h + r + 1.0)
    f1p = jnp.pad(
        feature1.astype(corr_dtype), ((0, 0), (pad, pad), (pad, pad), (0, 0))
    )

    x0 = jnp.floor(bx)
    y0 = jnp.floor(by)
    wx = (bx - x0).reshape(b, h * w, 1, 1)
    wy = (by - y0).reshape(b, h * w, 1, 1)
    starts = jnp.stack(
        [y0.astype(jnp.int32) - r + pad, x0.astype(jnp.int32) - r + pad],
        axis=-1,
    ).reshape(b, h * w, 2)

    f0_flat = feature0.astype(corr_dtype).reshape(b, h * w, c)

    def gather_row(img, idx):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return jax.lax.gather(
            img, idx, dn, slice_sizes=(1, k, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )[:, 0]  # (HW, k, C)

    def window_row(_, i):
        # Scan over the k window rows: bounds the gathered buffer to
        # O(B*H*W*k*C) instead of O(B*H*W*k^2*C) (the full-patch variant
        # OOMs at training batch sizes). Gather cost here is bound by the
        # count of contiguous memory runs (B*HW*k either way): whole-patch
        # (k, k, C) slices measured the same speed, so keep the
        # memory-lean row layout.
        row_starts = starts + jnp.stack(
            [jnp.full((), i, jnp.int32), jnp.zeros((), jnp.int32)]
        )
        rows = jax.vmap(gather_row)(f1p, row_starts)  # (B, HW, k, C)
        return None, jnp.einsum(
            "bpjc,bpc->bpj", rows, f0_flat,
            preferred_element_type=jnp.float32,
        )

    _, dots = jax.lax.scan(window_row, None, jnp.arange(k, dtype=jnp.int32))
    dots = jnp.moveaxis(dots, 0, 2)  # (B, HW, k, k)

    d00 = dots[:, :, :-1, :-1]
    d01 = dots[:, :, :-1, 1:]
    d10 = dots[:, :, 1:, :-1]
    d11 = dots[:, :, 1:, 1:]
    interp = (
        d00 * (1 - wy) * (1 - wx)
        + d01 * (1 - wy) * wx
        + d10 * wy * (1 - wx)
        + d11 * wy * wx
    )
    corr = interp[:, :, : 2 * r + 1, : 2 * r + 1]
    return corr.reshape(b, h, w, (2 * r + 1) ** 2) / math.sqrt(c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _local_corr_pallas_ad(
    local_radius, corr_dtype, interpret, variant, feature0, feature1, flow
):
    """Pallas local correlation with an XLA-derived VJP (see the public
    wrapper's docstring for why this exists). ``interpret`` runs the kernel
    in interpret mode so the wrapper is testable off-TPU."""
    from color_transfer_tpu.ops.local_corr import (
        local_correlation_with_flow_pallas,
    )

    return local_correlation_with_flow_pallas(
        feature0, feature1, flow, local_radius, corr_dtype=corr_dtype,
        interpret=interpret, variant=variant,
    )


def _local_corr_pallas_fwd(
    local_radius, corr_dtype, interpret, variant, feature0, feature1, flow
):
    out = _local_corr_pallas_ad(
        local_radius, corr_dtype, interpret, variant, feature0, feature1, flow
    )
    return out, (feature0, feature1, flow)


def _local_corr_pallas_bwd(
    local_radius, corr_dtype, interpret, variant, residuals, g
):
    feature0, feature1, flow = residuals
    _, vjp = jax.vjp(
        lambda f0, f1, fl: _local_correlation_with_flow_xla(
            f0, f1, fl, local_radius, corr_dtype
        ),
        feature0, feature1, flow,
    )
    return vjp(g)


_local_corr_pallas_ad.defvjp(_local_corr_pallas_fwd, _local_corr_pallas_bwd)


# ---------------------------------------------------------------------------
# Self-attention flow propagation (reference unimatch/attention.py:169-256)
# ---------------------------------------------------------------------------


class SelfAttnPropagation(nn.Module):
    in_channels: int = 128
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, feature0, flow, local_window_attn=False, local_window_radius=1):
        init = nn.initializers.xavier_uniform()
        q_proj = nn.Dense(self.in_channels, kernel_init=init,
                          dtype=self.dtype, name="q_proj")
        k_proj = nn.Dense(self.in_channels, kernel_init=init,
                          dtype=self.dtype, name="k_proj")

        b, h, w, c = feature0.shape
        query = q_proj(feature0)

        if not local_window_attn:
            # Reference quirk kept for checkpoint parity: in the GLOBAL path
            # the key is a projection of the already-projected query
            # (reference attention.py:201-208). The LOCAL path below projects
            # the raw feature instead (reference attention.py:236).
            key = k_proj(query)
            q = query.reshape(b, h * w, c)
            k = key.reshape(b, h * w, c)
            v = flow.reshape(b, h * w, flow.shape[-1])
            scores = jnp.einsum(
                "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(c)
            # flow (v) stays f32; the prob @ flow product runs in f32.
            out = jnp.einsum("blm,bmt->blt", jax.nn.softmax(scores, axis=-1), v)
            return out.reshape(b, h, w, flow.shape[-1])

        # Local 3x3 window: unfold key/flow with zero padding.
        key = k_proj(feature0)
        ksz = 2 * local_window_radius + 1
        key_w = _unfold_nhwc(key, ksz)  # (B, H, W, K2, C)
        flow_w = _unfold_nhwc(flow, ksz)  # (B, H, W, K2, 2)
        scores = jnp.einsum(
            "bhwc,bhwkc->bhwk", query, key_w,
            preferred_element_type=jnp.float32,
        ) / math.sqrt(c)
        prob = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhwk,bhwkt->bhwt", prob, flow_w)


def _unfold_nhwc(x, kernel_size):
    """Extract kernel_size^2 zero-padded neighborhoods: (B,H,W,C) ->
    (B,H,W,K2,C), window index row-major like torch F.unfold."""
    r = kernel_size // 2
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    views = []
    for dy in range(kernel_size):
        for dx in range(kernel_size):
            views.append(padded[:, dy : dy + h, dx : dx + w, :])
    return jnp.stack(views, axis=3)


# ---------------------------------------------------------------------------
# GRU refinement (reference unimatch/reg_refine.py)
# ---------------------------------------------------------------------------


class FlowHead(nn.Module):
    hidden_dim: int = 256
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=1, name="conv1")(x))
        return nn.Conv(self.out_dim, (3, 3), padding=1, name="conv2")(x)


class SepConvGRU(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        def gate(name, kern, inp):
            kh, kw = kern
            return nn.Conv(
                self.hidden_dim, (kh, kw), padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                name=name,
            )(inp)

        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(gate("convz1", (1, 5), hx))
        r = nn.sigmoid(gate("convr1", (1, 5), hx))
        q = nn.tanh(gate("convq1", (1, 5), jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q

        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(gate("convz2", (5, 1), hx))
        r = nn.sigmoid(gate("convr2", (5, 1), hx))
        q = nn.tanh(gate("convq2", (5, 1), jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    flow_channels: int = 2

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=1, name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=3, name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2")(flo))
        out = nn.relu(
            nn.Conv(128 - self.flow_channels, (3, 3), padding=1, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    downsample_factor: int = 4
    flow_dim: int = 2

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.flow_dim, name="encoder")(flow, corr)
        inp = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(name="gru")(net, inp)
        delta_flow = FlowHead(name="flow_head")(net)
        mask = nn.Conv(256, (3, 3), padding=1, name="mask_0")(net)
        mask = nn.Conv(
            self.downsample_factor**2 * 9, (1, 1), name="mask_2"
        )(nn.relu(mask))
        return net, mask, delta_flow


def upsample_flow_with_mask(flow, up_mask, upsample_factor):
    """RAFT convex upsampling (reference unimatch/utils.py:137-155)."""
    b, h, w, _ = flow.shape
    k = upsample_factor
    mask = up_mask.reshape(b, h, w, 9, k, k)
    mask = jax.nn.softmax(mask, axis=3)

    flow_w = _unfold_nhwc(flow * k, 3)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwnkl,bhwnt->bhwklt", mask, flow_w)  # (B,H,W,k,k,2)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, k, W, k, 2)
    return up.reshape(b, h * k, w * k, 2)


# ---------------------------------------------------------------------------
# UniMatch core (flow task) + GMFlow wrapper
# ---------------------------------------------------------------------------

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class UniMatchFlow(nn.Module):
    """Flow-task UniMatch with the GMFlow pretrained config
    (reference unimatch/unimatch.py:19-370, task='flow' branches only; the
    stereo/depth branches are dead code for this framework's workload)."""

    num_scales: int = 2
    feature_channels: int = 128
    upsample_factor: int = 4
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    # dtype of the GRU-refinement correlation gather+dot (the dominant HBM
    # traffic of the matcher); jnp.float32 for bit-strict parity checks.
    corr_dtype: jnp.dtype = jnp.float32
    # computation dtype of the backbone convs + transformer stack (params
    # stay f32; flow math, softmaxes and the GRU refiner stay f32). bf16 is
    # the throughput path — parity-gate it with the mini 31-distortion
    # protocol before enabling for quality-reporting runs.
    compute_dtype: jnp.dtype = None
    # Fused Pallas windowed attention (ops/win_attention.py); off until
    # measured on TPU — numerics are kernel-parity-tested either way.
    fused_attention: object = "auto"  # see TransformerLayer.fused_attention
    # Selective-precision override for everything downstream of the
    # transformer that touches FLOW VALUES: the correlation softmaxes'
    # feature inputs, SelfAttnPropagation, and the GRU refinement loop
    # (incl. its local correlation). jnp.float32 together with
    # compute_dtype=bf16 confines bf16 to the feature-PRODUCING stacks
    # (backbone convs + transformer). Round-5 gate measurement
    # (PARITY_RESULTS.md round-5): this does NOT change the worst-case
    # drift vs full-bf16 — bf16 rounding of the feature VALUES alone is
    # amplified by the iterative refinement to the same saturated scale —
    # but it keeps per-iteration flow arithmetic exact (strictly smaller
    # flow error on the same features). None = no override (corr_dtype /
    # compute_dtype apply unchanged).
    refine_dtype: jnp.dtype = None

    def setup(self):
        self.backbone = CNNEncoder(
            self.feature_channels, self.num_scales, dtype=self.compute_dtype
        )
        self.transformer = FeatureTransformer(
            self.num_transformer_layers, self.feature_channels,
            self.ffn_dim_expansion, dtype=self.compute_dtype,
            fused_attention=self.fused_attention,
        )
        self.feature_flow_attn = SelfAttnPropagation(
            self.feature_channels,
            dtype=(self.refine_dtype if self.refine_dtype is not None
                   else self.compute_dtype),
        )
        self.refine_proj = nn.Conv(256, (1, 1), name="refine_proj")
        self.refine = BasicUpdateBlock(self.upsample_factor, 2)

    def extract_feature(self, img0, img1):
        concat = jnp.concatenate([img0, img1], axis=0)
        features = self.backbone(concat)[::-1]  # low to high res
        f0 = [jnp.split(f, 2, axis=0)[0] for f in features]
        f1 = [jnp.split(f, 2, axis=0)[1] for f in features]
        return f0, f1

    def __call__(
        self,
        img0,
        img1,
        attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4),
        prop_radius_list=(-1, 1),
        num_reg_refine=6,
        pred_bidir_flow=False,
    ):
        """img0/img1: (B, H, W, 3) in [0, 255]. Returns the final flow
        ((B or 2B), H, W, 2); bidirectional output is [fwd x B, bwd x B]."""
        if num_reg_refine < 1:
            # The convex-upsample mask comes from the refinement loop (the
            # reference asserts the same, unimatch/unimatch.py:276).
            raise ValueError("num_reg_refine must be >= 1")
        img0 = (img0 / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
        img1 = (img1 / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD

        feature0_list, feature1_list = self.extract_feature(img0, img1)
        flow = None

        for scale_idx in range(self.num_scales):
            feature0, feature1 = feature0_list[scale_idx], feature1_list[scale_idx]

            if pred_bidir_flow and scale_idx > 0:
                feature0, feature1 = (
                    jnp.concatenate([feature0, feature1], axis=0),
                    jnp.concatenate([feature1, feature0], axis=0),
                )
            feature0_ori, feature1_ori = feature0, feature1

            if scale_idx > 0:
                up = resize_bilinear(
                    jnp.moveaxis(flow, -1, 1), feature0.shape[1:3], align_corners=True
                )
                flow = jnp.moveaxis(up, 1, -1) * 2.0

            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                feature1 = jax.vmap(flow_warp)(feature1, flow)

            attn_splits = attn_splits_list[scale_idx]
            corr_radius = corr_radius_list[scale_idx]
            prop_radius = prop_radius_list[scale_idx]

            feature0, feature1 = feature_add_position(
                feature0, feature1, attn_splits, self.feature_channels
            )
            feature0, feature1 = self.transformer(feature0, feature1, attn_splits)
            if self.refine_dtype is not None:
                # Selective recipe: flow-value arithmetic (correlation
                # softmax expectations, self-attn propagation, GRU loop)
                # runs in refine_dtype even when the transformer computed
                # the feature VALUES in bf16.
                feature0 = feature0.astype(self.refine_dtype)
                feature1 = feature1.astype(self.refine_dtype)
                feature0_ori = feature0_ori.astype(self.refine_dtype)
                feature1_ori = feature1_ori.astype(self.refine_dtype)

            if corr_radius == -1:
                flow_pred = global_correlation_softmax(
                    feature0, feature1, pred_bidir_flow
                )[0]
            else:
                flow_pred = local_correlation_softmax(feature0, feature1, corr_radius)[0]

            flow = flow + flow_pred if flow is not None else flow_pred

            if pred_bidir_flow and scale_idx == 0:
                feature0 = jnp.concatenate([feature0, feature1], axis=0)

            flow = self.feature_flow_attn(
                feature0,
                jax.lax.stop_gradient(flow),
                local_window_attn=prop_radius > 0,
                local_window_radius=prop_radius,
            )

            if scale_idx == self.num_scales - 1:
                for _ in range(num_reg_refine):
                    flow = jax.lax.stop_gradient(flow)
                    correlation = local_correlation_with_flow(
                        feature0_ori, feature1_ori, flow, local_radius=4,
                        corr_dtype=(self.refine_dtype
                                    if self.refine_dtype is not None
                                    else self.corr_dtype),
                    )
                    proj = self.refine_proj(feature0)
                    net, inp = jnp.split(proj, 2, axis=-1)
                    net = jnp.tanh(net)
                    inp = nn.relu(inp)
                    net, up_mask, residual_flow = self.refine(net, inp, correlation, flow)
                    flow = flow + residual_flow

                flow_up = upsample_flow_with_mask(flow, up_mask, self.upsample_factor)

        return flow_up


class GMFlow(nn.Module):
    """Inference wrapper with the reference's resize / bidirectional /
    occlusion protocol (reference unimatch/__init__.py:60-167)."""

    inference_size: tuple = None  # static (H, W) the matcher runs at
    num_transformer_layers: int = 6
    num_reg_refine: int = 6
    corr_dtype: jnp.dtype = jnp.float32  # see UniMatchFlow.corr_dtype
    compute_dtype: jnp.dtype = None  # see UniMatchFlow.compute_dtype
    fused_attention: object = "auto"  # see UniMatchFlow.fused_attention
    refine_dtype: jnp.dtype = None  # see UniMatchFlow.refine_dtype

    def setup(self):
        self.core = UniMatchFlow(
            num_transformer_layers=self.num_transformer_layers,
            corr_dtype=self.corr_dtype,
            compute_dtype=self.compute_dtype,
            fused_attention=self.fused_attention,
            refine_dtype=self.refine_dtype,
        )

    def __call__(self, img0, img1, pred_bidir_flow=True,
                 fwd_bwd_consistency_check=True, inference_size=None):
        """img0/img1: (B, H, W, 3) in [0, 255]. Returns dict with 'flow'
        (B, H, W, 2) and, when requested, 'flow_bwd', 'fwd_occ', 'bwd_occ'.
        ``inference_size`` (static) overrides the module default; None means
        round up to the next x32 (reference unimatch/__init__.py:96-100).

        Portrait inputs (H > W) are transposed through the matcher — the
        pretrained model was trained width > height (reference
        unimatch/__init__.py:91-94); the flow components swap back after.
        """
        if img0.shape[1] > img0.shape[2]:
            out = self(
                jnp.swapaxes(img0, 1, 2),
                jnp.swapaxes(img1, 1, 2),
                pred_bidir_flow=pred_bidir_flow,
                fwd_bwd_consistency_check=fwd_bwd_consistency_check,
                inference_size=inference_size,
            )
            def untranspose(v):
                v = jnp.swapaxes(v, 1, 2)
                if v.shape[-1] == 2:  # flow: swap (dx, dy) back
                    v = v[..., ::-1]
                return v
            return {k: untranspose(v) for k, v in out.items()}

        b, orig_h, orig_w, _ = img0.shape

        inference_size = inference_size or self.inference_size
        if inference_size is None:
            inf_h = -(-orig_h // 32) * 32
            inf_w = -(-orig_w // 32) * 32
        else:
            inf_h, inf_w = inference_size

        def resize(img, hw):
            return jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(img, -1, 1), hw, align_corners=True), 1, -1
            )

        if (inf_h, inf_w) != (orig_h, orig_w):
            img0 = resize(img0, (inf_h, inf_w))
            img1 = resize(img1, (inf_h, inf_w))

        flow_pr = self.core(
            img0, img1, pred_bidir_flow=pred_bidir_flow,
            num_reg_refine=self.num_reg_refine,
        )

        if (inf_h, inf_w) != (orig_h, orig_w):
            flow_pr = resize(flow_pr, (orig_h, orig_w))
            flow_pr = flow_pr * jnp.array(
                [orig_w / inf_w, orig_h / inf_h], dtype=flow_pr.dtype
            )

        if not pred_bidir_flow:
            return {"flow": flow_pr}

        flow, flow_bwd = flow_pr[:b], flow_pr[b:]
        results = {"flow": flow, "flow_bwd": flow_bwd}
        if fwd_bwd_consistency_check:
            fwd_occ, bwd_occ = jax.vmap(forward_backward_consistency)(flow, flow_bwd)
            results["fwd_occ"] = fwd_occ[..., None]
            results["bwd_occ"] = bwd_occ[..., None]
        return results
