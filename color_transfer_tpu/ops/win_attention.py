"""Fused per-window attention Pallas kernel.

One VMEM-resident pass per window group: QK^T -> (+shift mask) -> f32
softmax -> PV. The XLA lowering of the same math (models/gmflow.py::
_attention, mirroring reference unimatch/attention.py:48-107) materializes
the (B', L, L) score and probability tensors in HBM — at the DMSCT train
shape (6144 windows of 120 tokens) that is ~350 MB of f32 round-tripped
per attention call, 12 calls per matcher scale. Here scores never leave
VMEM.

Numerics match ``_attention`` exactly: scores accumulate in f32 (f32
operands force ``Precision.HIGHEST`` because this backend lowers default
f32 matmuls to one-pass bf16 — see PERF.md), the softmax runs in f32, the
probabilities are cast back to the operand dtype before the PV dot, and
the PV dot accumulates in f32.

Shift masks ride a SMALL (n_mask, L, L) operand held fully VMEM-resident;
window ``i`` reads row ``i % n_mask`` — the (B', L, L) tiled mask of the
XLA path is never built.

Gradients: the public wrapper carries a custom VJP whose backward pass is
the XLA reference implementation (same pattern as the local-correlation
kernel, models/gmflow.py:693-733) — the DMSCT matcher is frozen behind
``stop_gradient`` so the backward is trace-only there, but the op stays
differentiable for standalone GMFlow use.
"""

import functools
import math
from functools import lru_cache

# Abramowitz & Stegun 7.1.26 erf coefficients (max abs error 1.5e-7):
# this Pallas TPU toolchain has no erf/erfc lowering, so the in-kernel
# exact-gelu path (reference transformer.py:31 uses torch's erf gelu)
# evaluates erf with this f32 minimax form instead. The approximation is
# used in BOTH compiled and interpret modes so the canary tests compare
# like against like; the custom-VJP backward stays on XLA's exact gelu.
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# VMEM ceiling for routing (bytes) — q/k/v/out blocks + resident mask must
# fit comfortably under the 16 MB default scoped-vmem budget alongside
# Mosaic's double-buffering of the grid-mapped operands.
_VMEM_CAP = 8 * 1024 * 1024


@lru_cache(maxsize=32)
def shift_window_mask(h, w, k):
    """Additive (-100 / 0) shifted-window mask, numpy trace-time constant,
    shape (k*k, hs*ws, hs*ws) (reference unimatch/utils.py:87-111).

    Region labels are written directly in rolled coordinates (the standard
    swin construction): tokens of the same window attend iff their 3x3
    (h-band, w-band) region labels agree."""
    hs, ws = h // k, w // k
    sh, sw = hs // 2, ws // 2
    img = np.zeros((1, h, w, 1), dtype=np.float32)
    cnt = 0
    for hsl in (slice(0, -hs), slice(-hs, -sh), slice(-sh, None)):
        for wsl in (slice(0, -ws), slice(-ws, -sw), slice(-sw, None)):
            img[:, hsl, wsl, :] = cnt
            cnt += 1
    win = img.reshape(1, k, hs, k, ws, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(k * k, hs * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_attention_xla(q, k, v, mask=None):
    """XLA reference: identical math to models/gmflow.py::_attention with a
    lazily tiled per-window mask. Used for the kernel's VJP and tests."""
    c = q.shape[-1]
    scores = jnp.einsum(
        "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(c)
    if mask is not None:
        n_mask = mask.shape[0]
        scores = (
            scores.reshape(-1, n_mask, *scores.shape[1:]) + mask[None]
        ).reshape(scores.shape)
    prob = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("blm,bmc->blc", prob, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _working_set(wb, length, c, itemsize, mask_shape):
    # double-buffered q/k/v/out blocks + f32 score/prob temporaries for the
    # in-flight window + the fully resident shift mask
    vmem = 2 * 4 * wb * length * c * itemsize + 2 * length * length * 4
    if mask_shape is not None:
        vmem += mask_shape[0] * length * length * 4
    return vmem


def _pick_wb(n_windows, length=None, c=None, itemsize=4, mask_shape=None):
    """Largest window-group size whose VMEM working set fits (shape-only
    call sites pass just n_windows for the divisibility rule)."""
    for wb in (8, 4, 2):
        if n_windows % wb != 0:
            continue
        if length is not None and (
            _working_set(wb, length, c, itemsize, mask_shape) > _VMEM_CAP
        ):
            continue
        return wb
    return 1


def eligible(q_shape, q_dtype, mask_shape=None):
    """True when the fused kernel's VMEM working set fits (the routing
    guard models/gmflow.py uses before swapping in the kernel)."""
    bp, length, c = q_shape
    itemsize = jnp.dtype(q_dtype).itemsize
    wb = _pick_wb(bp, length, c, itemsize, mask_shape)
    return _working_set(wb, length, c, itemsize, mask_shape) <= _VMEM_CAP


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, wb):
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def body(j, carry):
        qj, kj, vj = q_ref[j], k_ref[j], v_ref[j]
        s = (
            jax.lax.dot_general(
                qj, kj, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            )
            * scale
        )
        p = jax.nn.softmax(s, axis=-1).astype(qj.dtype)
        o = jax.lax.dot_general(
            p, vj, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        o_ref[j] = o.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, wb, body, 0)


def _region_vectors(widx, k, hs, ws):
    """Per-token 3x3 region labels for shifted-window masking, computed
    from index arithmetic (no mask operand): returns (L, 1) and (1, L)
    int32 label arrays for window ``widx`` (a traced scalar)."""
    length = hs * ws
    sh, sw = hs // 2, ws // 2
    wi = widx // k
    wj = jax.lax.rem(widx, k)

    def labels(shape, dim):
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, dim)
        r = ids // ws
        c = jax.lax.rem(ids, ws)
        hband = jnp.where(
            wi == k - 1, jnp.where(r < hs - sh, 1, 2), 0
        )
        wband = jnp.where(
            wj == k - 1, jnp.where(c < ws - sw, 1, 2), 0
        )
        return 3 * hband + wband

    return labels((length, 1), 0), labels((1, length), 1)


def _kernel_shift(q_ref, k_ref, v_ref, o_ref, *, scale, wb, k, hs, ws):
    """Shifted-window attention with the swin mask generated in-kernel
    from window geometry — no resident mask operand."""
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    base = pl.program_id(0) * wb
    kk = k * k

    def body(j, carry):
        qj, kj, vj = q_ref[j], k_ref[j], v_ref[j]
        s = (
            jax.lax.dot_general(
                qj, kj, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            )
            * scale
        )
        reg_i, reg_j = _region_vectors(jax.lax.rem(base + j, kk), k, hs, ws)
        s = jnp.where(reg_i != reg_j, s - 100.0, s)
        p = jax.nn.softmax(s, axis=-1).astype(qj.dtype)
        o = jax.lax.dot_general(
            p, vj, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        o_ref[j] = o.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, wb, body, 0)


def _kernel_masked(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, wb, n_mask):
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    base = pl.program_id(0) * wb

    def body(j, carry):
        qj, kj, vj = q_ref[j], k_ref[j], v_ref[j]
        s = (
            jax.lax.dot_general(
                qj, kj, (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32,
            )
            * scale
        )
        s = s + m_ref[jax.lax.rem(base + j, n_mask)]
        p = jax.nn.softmax(s, axis=-1).astype(qj.dtype)
        o = jax.lax.dot_general(
            p, vj, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )
        o_ref[j] = o.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, wb, body, 0)


def _call(q, k, v, mask, shift_windows, interpret):
    bp, length, c = q.shape
    wb = _pick_wb(
        bp, length, c, jnp.dtype(q.dtype).itemsize,
        None if mask is None else mask.shape,
    )
    scale = 1.0 / math.sqrt(c)
    grid = (bp // wb,)
    qkv_spec = pl.BlockSpec((wb, length, c), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((wb, length, c), lambda i: (i, 0, 0))
    if shift_windows is not None:
        kw, hs, ws = shift_windows
        return pl.pallas_call(
            functools.partial(
                _kernel_shift, scale=scale, wb=wb, k=kw, hs=hs, ws=ws
            ),
            grid=grid,
            in_specs=[qkv_spec] * 3,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(q, k, v)
    if mask is None:
        return pl.pallas_call(
            functools.partial(_kernel, scale=scale, wb=wb),
            grid=grid,
            in_specs=[qkv_spec] * 3,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(q, k, v)
    n_mask = mask.shape[0]
    mask_spec = pl.BlockSpec(mask.shape, lambda i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_masked, scale=scale, wb=wb, n_mask=n_mask),
        grid=grid,
        in_specs=[qkv_spec] * 3 + [mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, mask.astype(jnp.float32))


def layer_norm(x, scale, bias, eps=1e-6, out_dtype=None):
    """LayerNorm over the last axis, bit-matching flax.linen.LayerNorm's
    computation order (f32 stats, mul = rsqrt(var+eps)*scale,
    y = (x-mean)*mul + bias, cast to out_dtype)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (xf - mean) * mul + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def window_sublayer_xla(x_src, x_tgt, w_q, w_kv, w_merge, mask=None,
                        norm=None, add_residual=False):
    """XLA reference for the fused attention SUBLAYER: q/kv projections +
    windowed attention + merge projection, with optional LayerNorm
    (norm=(scale, bias)) and residual-add epilogue. Mirrors the exact cast
    chain of models/gmflow.py::TransformerLayer's windowed path."""
    c = w_q.shape[1]
    q = x_src @ w_q
    kv = x_tgt @ w_kv
    k, v = kv[..., :c], kv[..., c:]
    msg = window_attention_xla(q, k, v, mask)
    msg = msg @ w_merge
    if norm is not None:
        msg = layer_norm(msg, norm[0], norm[1])
    if add_residual:
        msg = x_src + msg
    return msg


def _ln_epilogue(y_f32, ns_ref, nb_ref, eps=1e-6):
    """In-kernel LayerNorm on f32 values, matching :func:`layer_norm`."""
    mean = jnp.mean(y_f32, axis=-1, keepdims=True)
    mean2 = jnp.mean(y_f32 * y_f32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mean2 - mean * mean)
    mul = jax.lax.rsqrt(var + eps) * ns_ref[0].astype(jnp.float32)
    return (y_f32 - mean) * mul + nb_ref[0].astype(jnp.float32)


def _kernel_sublayer(
    xs_ref, xt_ref, wq_ref, wkv_ref, wm_ref, ns_ref, nb_ref, o_ref, *,
    scale, wb, geom, add_residual
):
    """Whole attention sublayer per window group, weights VMEM-resident:
    one read of the token tensors and one write of the normalized message
    replace the six HBM passes of the op-by-op lowering (qkv dot,
    attention in/out, merge dot, LayerNorm, residual add)."""
    prec = (
        jax.lax.Precision.HIGHEST
        if xs_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    c = wq_ref.shape[1]
    base = pl.program_id(0) * wb

    def _dot(a, b, contract=((1,), (0,))):
        return jax.lax.dot_general(
            a, b, (contract, ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    def body(j, carry):
        xsj = xs_ref[j]
        xtj = xt_ref[j]
        dtype = xsj.dtype
        q = _dot(xsj, wq_ref[...]).astype(dtype)
        kv = _dot(xtj, wkv_ref[...]).astype(dtype)
        k, v = kv[:, :c], kv[:, c:]
        s = _dot(q, k, contract=((1,), (1,))) * scale
        if geom is not None:
            kw, hs, ws = geom
            reg_i, reg_j = _region_vectors(
                jax.lax.rem(base + j, kw * kw), kw, hs, ws
            )
            s = jnp.where(reg_i != reg_j, s - 100.0, s)
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
        msg = _dot(p, v).astype(dtype)
        # LN stats run on the dtype-rounded merge output (matching the
        # layout-naive path, where the cast happens before LayerNorm).
        y = _dot(msg, wm_ref[...]).astype(dtype).astype(jnp.float32)
        y = _ln_epilogue(y, ns_ref, nb_ref).astype(dtype)
        if add_residual:
            y = xsj + y
        o_ref[j] = y.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, wb, body, 0)


def _sublayer_call(x_src, x_tgt, w_q, w_kv, w_merge, norm_scale, norm_bias,
                   shift_windows, add_residual, interpret):
    bp, length, c = x_src.shape
    wb = _pick_wb(bp, length, c, jnp.dtype(x_src.dtype).itemsize, None)
    grid = (bp // wb,)
    tok_spec = pl.BlockSpec((wb, length, c), lambda i: (i, 0, 0))

    def _w_spec(w):
        return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim)

    return pl.pallas_call(
        functools.partial(
            _kernel_sublayer,
            scale=1.0 / math.sqrt(c),
            wb=wb,
            geom=shift_windows,
            add_residual=add_residual,
        ),
        grid=grid,
        in_specs=[tok_spec, tok_spec, _w_spec(w_q), _w_spec(w_kv),
                  _w_spec(w_merge), _w_spec(norm_scale), _w_spec(norm_bias)],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct(x_src.shape, x_src.dtype),
        interpret=interpret,
    )(x_src, x_tgt, w_q, w_kv, w_merge, norm_scale, norm_bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _win_sublayer_ad(interpret, shift_windows, add_residual, x_src, x_tgt,
                     w_q, w_kv, w_m, n_s, n_b):
    return _sublayer_call(x_src, x_tgt, w_q, w_kv, w_m, n_s, n_b,
                          shift_windows, add_residual, interpret)


def _win_sublayer_fwd(interpret, shift_windows, add_residual, x_src, x_tgt,
                      w_q, w_kv, w_m, n_s, n_b):
    out = _win_sublayer_ad(interpret, shift_windows, add_residual, x_src,
                           x_tgt, w_q, w_kv, w_m, n_s, n_b)
    return out, (x_src, x_tgt, w_q, w_kv, w_m, n_s, n_b)


def _win_sublayer_bwd(interpret, shift_windows, add_residual, residuals, g):
    x_src, x_tgt, w_q, w_kv, w_m, n_s, n_b = residuals
    mask = None
    if shift_windows is not None:
        kw, hs, ws = shift_windows
        mask = jnp.asarray(shift_window_mask(kw * hs, kw * ws, kw)).astype(
            jnp.float32
        )
    _, vjp = jax.vjp(
        lambda a, b, c_, d, e, f_, g_: window_sublayer_xla(
            a, b, c_, d, e, mask, norm=(f_.reshape(-1), g_.reshape(-1)),
            add_residual=add_residual,
        ),
        x_src, x_tgt, w_q, w_kv, w_m, n_s, n_b,
    )
    return vjp(g)


_win_sublayer_ad.defvjp(_win_sublayer_fwd, _win_sublayer_bwd)


def window_sublayer_fused(x_src, x_tgt, w_q, w_kv, w_merge, norm_scale,
                          norm_bias, *, shift_windows=None,
                          add_residual=False, interpret=False):
    """Fused attention sublayer: q/kv projections + windowed attention +
    merge projection + LayerNorm (+ optional residual add). x_src/x_tgt:
    (B', L, C) window-major tokens (pass x_src twice for self-attention —
    AD sums the two cotangents); weights (C, C) / (C, 2C) / (C, C) and LN
    scale/bias (C,), same dtype family as the tokens. shift_windows =
    (k, hs, ws) generates the swin mask in-kernel; add_residual emits
    x_src + LN(...) (the no-FFN layer's full output).

    f32 dots run at Precision.HIGHEST inside the kernel (this backend
    lowers default f32 dots to one-pass bf16), so compiled results can be
    slightly MORE accurate than the XLA default-precision path."""
    bp, length, c = x_src.shape
    if x_tgt.shape != x_src.shape or x_tgt.dtype != x_src.dtype:
        raise ValueError("x_src/x_tgt must match in shape and dtype")
    if w_q.shape != (c, c) or w_kv.shape != (c, 2 * c) or \
            w_merge.shape != (c, c):
        raise ValueError("weight shapes must be (C,C)/(C,2C)/(C,C)")
    if shift_windows is not None:
        kw, hs, ws = shift_windows
        if hs * ws != length or bp % (kw * kw) != 0:
            raise ValueError(
                f"shift_windows {shift_windows} inconsistent with tokens "
                f"({bp}, {length})"
            )
    return _win_sublayer_ad(
        interpret, shift_windows, add_residual, x_src, x_tgt, w_q, w_kv,
        w_merge, norm_scale.reshape(1, c), norm_bias.reshape(1, c),
    )


def ffn_xla(x_src, x_msg, w0, w2, norm=None, add_residual=False):
    """XLA reference for the transformer FFN: exact-gelu MLP over the
    [source | message] concatenation (reference transformer.py:28-34),
    mirroring the cast chain of the nn.Dense path, with optional
    LayerNorm (norm=(scale, bias)) and residual-add epilogue."""
    y = jnp.concatenate([x_src, x_msg], axis=-1) @ w0
    y = jax.nn.gelu(y, approximate=False)
    y = y @ w2
    if norm is not None:
        y = layer_norm(y, norm[0], norm[1])
    if add_residual:
        y = x_src + y
    return y


def _gelu_exact_kernel(x):
    """Exact (erf) gelu for Pallas TPU kernels, evaluated in f32.

    gelu(x) = 0.5 x (1 + erf(x/sqrt(2))) with erf from A&S 7.1.26
    (|err| <= 1.5e-7, i.e. gelu error <= ~2e-7 over the non-saturated
    range — below the fused-kernel test tolerances vs XLA's erfc gelu).
    """
    xf = x.astype(jnp.float32)
    z = xf * np.float32(1.0 / math.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(_ERF_P) * az)
    a1, a2, a3, a4, a5 = (np.float32(a) for a in _ERF_A)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z < 0.0, -erf_abs, erf_abs)
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def _ffn_working_set(wb, length, c, itemsize, ffn_dim):
    return (
        2 * 3 * wb * length * c * itemsize  # double-buffered src/msg/out
        + length * ffn_dim * 4              # in-flight f32 intermediate
        + (2 * c + c) * ffn_dim * itemsize  # resident w0/w2
    )


def _pick_wb_ffn(bp, length, c, itemsize, ffn_dim):
    for wb in (8, 4, 2):
        if bp % wb == 0 and (
            _ffn_working_set(wb, length, c, itemsize, ffn_dim) <= _VMEM_CAP
        ):
            return wb
    return 1


def ffn_eligible(x_shape, x_dtype, ffn_dim):
    """VMEM guard for the fused FFN kernel."""
    bp, length, c = x_shape
    itemsize = jnp.dtype(x_dtype).itemsize
    wb = _pick_wb_ffn(bp, length, c, itemsize, ffn_dim)
    return _ffn_working_set(wb, length, c, itemsize, ffn_dim) <= _VMEM_CAP


def _kernel_ffn(xs_ref, xm_ref, w0_ref, w2_ref, ns_ref, nb_ref, o_ref, *,
                wb, c, add_residual):
    """gelu([src|msg] @ w0) @ w2 (+ LayerNorm + residual) per window group
    — the (L, ffn_dim) f32 intermediate lives only in VMEM (the XLA
    lowering round-trips it through HBM: ~3 GB per layer at the DMSCT
    scale1 train shape). The concatenated first dot splits into two dots
    over w0's row blocks, which is numerically identical."""
    prec = (
        jax.lax.Precision.HIGHEST
        if xs_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, ((((1,), (0,))), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        )

    def body(j, carry):
        xsj = xs_ref[j]
        xmj = xm_ref[j]
        dtype = xsj.dtype
        y = (_dot(xsj, w0_ref[:c]) + _dot(xmj, w0_ref[c:])).astype(dtype)
        y = _gelu_exact_kernel(y)
        y = _dot(y, w2_ref[...]).astype(dtype).astype(jnp.float32)
        y = _ln_epilogue(y, ns_ref, nb_ref).astype(dtype)
        if add_residual:
            y = xsj + y
        o_ref[j] = y.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, wb, body, 0)


def _ffn_call(x_src, x_msg, w0, w2, n_s, n_b, add_residual, interpret):
    bp, length, c = x_src.shape
    wb = _pick_wb_ffn(
        bp, length, c, jnp.dtype(x_src.dtype).itemsize, w0.shape[1]
    )
    grid = (bp // wb,)
    tok_spec = pl.BlockSpec((wb, length, c), lambda i: (i, 0, 0))

    def _w_spec(w):
        return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim)

    return pl.pallas_call(
        functools.partial(_kernel_ffn, wb=wb, c=c, add_residual=add_residual),
        grid=grid,
        in_specs=[tok_spec, tok_spec, _w_spec(w0), _w_spec(w2),
                  _w_spec(n_s), _w_spec(n_b)],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct(x_src.shape, x_src.dtype),
        interpret=interpret,
    )(x_src, x_msg, w0, w2, n_s, n_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ffn_ad(interpret, add_residual, x_src, x_msg, w0, w2, n_s, n_b):
    return _ffn_call(x_src, x_msg, w0, w2, n_s, n_b, add_residual, interpret)


def _ffn_fwd(interpret, add_residual, x_src, x_msg, w0, w2, n_s, n_b):
    out = _ffn_ad(interpret, add_residual, x_src, x_msg, w0, w2, n_s, n_b)
    return out, (x_src, x_msg, w0, w2, n_s, n_b)


def _ffn_bwd(interpret, add_residual, residuals, g):
    x_src, x_msg, w0, w2, n_s, n_b = residuals
    _, vjp = jax.vjp(
        lambda a, b, c_, d, e, f_: ffn_xla(
            a, b, c_, d, norm=(e.reshape(-1), f_.reshape(-1)),
            add_residual=add_residual,
        ),
        x_src, x_msg, w0, w2, n_s, n_b,
    )
    return vjp(g)


_ffn_ad.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_fused(x_src, x_msg, w0, w2, norm_scale, norm_bias, *,
              add_residual=False, interpret=False):
    """Fused transformer FFN (+ LayerNorm + optional residual) over
    window-major tokens. x_src/x_msg: (B', L, C); w0: (2C, F); w2: (F, C);
    LN scale/bias (C,). Guard with :func:`ffn_eligible`."""
    bp, length, c = x_src.shape
    if x_msg.shape != x_src.shape or x_msg.dtype != x_src.dtype:
        raise ValueError("x_src/x_msg must match in shape and dtype")
    if w0.shape[0] != 2 * c or w2.shape != (w0.shape[1], c):
        raise ValueError(
            f"weight shapes {w0.shape}/{w2.shape} inconsistent with C={c}"
        )
    return _ffn_ad(
        interpret, add_residual, x_src, x_msg, w0, w2,
        norm_scale.reshape(1, c), norm_bias.reshape(1, c),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _win_attention_ad(interpret, shift_windows, q, k, v, mask):
    return _call(q, k, v, mask, shift_windows, interpret)


def _win_attention_fwd(interpret, shift_windows, q, k, v, mask):
    out = _win_attention_ad(interpret, shift_windows, q, k, v, mask)
    return out, (q, k, v, mask)


def _win_attention_bwd(interpret, shift_windows, residuals, g):
    q, k, v, mask = residuals
    if shift_windows is not None:
        kw, hs, ws = shift_windows
        mask = jnp.asarray(shift_window_mask(kw * hs, kw * ws, kw))
    _, vjp = jax.vjp(lambda a, b, d: window_attention_xla(a, b, d, mask), q, k, v)
    dq, dk, dv = vjp(g)
    # The shift mask is a trace-time constant; its cotangent is never used.
    dmask = None if residuals[3] is None else jnp.zeros_like(residuals[3])
    return dq, dk, dv, dmask


_win_attention_ad.defvjp(_win_attention_fwd, _win_attention_bwd)


def window_attention_fused(q, k, v, mask=None, *, shift_windows=None,
                           interpret=False):
    """Fused windowed attention. q/k/v: (B', L, C) window-major tokens.

    Shifted-window masking comes in two forms (mutually exclusive):
      * ``mask``: additive (n_mask, L, L) operand held VMEM-resident;
        window i reads ``mask[i % n_mask]`` — the generic form;
      * ``shift_windows=(k, hs, ws)``: the standard swin mask is generated
        IN-KERNEL from window geometry (two iotas + a region-label
        comparison) — no mask operand, no VMEM cost, so large-window
        shifted layers stay eligible.

    Callers should guard with :func:`eligible`; this function asserts the
    same invariants rather than silently falling back."""
    bp, length, c = q.shape
    if mask is not None and shift_windows is not None:
        raise ValueError("pass either mask or shift_windows, not both")
    if mask is not None and bp % mask.shape[0] != 0:
        raise ValueError(
            f"window count {bp} not a multiple of mask periods {mask.shape[0]}"
        )
    if shift_windows is not None:
        kw, hs, ws = shift_windows
        if hs * ws != length or bp % (kw * kw) != 0:
            raise ValueError(
                f"shift_windows {shift_windows} inconsistent with tokens "
                f"({bp}, {length})"
            )
    return _win_attention_ad(interpret, shift_windows, q, k, v, mask)
