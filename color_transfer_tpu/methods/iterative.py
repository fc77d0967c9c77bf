"""Iterative distribution transfer and automated color grading, on-device.

TPU-first re-design of the reference's Pitié et al. methods
(reference methods/iterative.py). Key transformations:

  * The per-iteration random SO(3) rotation (reference :32 uses
    scipy.stats.special_ortho_group) becomes a batch of Haar rotations
    built by modified Gram-Schmidt over Gaussian columns (det +1 via cross
    product) — statistically equivalent, seeded and reproducible, and
    orthogonal to f32 precision (see ``random_rotations``).
  * The per-axis histogram/CDF/interp inner loop (reference :38-53) is
    vmapped over the 3 rotated axes and scanned over the n_iter rotations
    with ``lax.scan`` — one fused XLA program instead of 12 NumPy passes.
  * The regrain solver (reference :62-115) keeps its recursive half-res
    pyramid (depth is static given the image shape, so recursion happens at
    trace time) and runs each Jacobi-style sweep as a ``lax.fori_loop`` — a
    classic stencil that XLA fuses into a few elementwise kernels.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from color_transfer_tpu.core.resize import resize_antialias, resize_bilinear


_SPLIT = 16  # bin index decomposed as idx = 16*hi + lo for the MXU trick


def _onehot_pair(idx, dtype=jnp.bfloat16):
    """Decompose bin indices in [0, 256) into two 16-way one-hots.

    The pair turns 256-entry histogram/table operations into 16x16 matmuls
    that run on the MXU instead of N*256 compare-reductions on the VPU
    (~8x measured at 1080p). bf16 is exact for 0/1 values.
    """
    hi = idx // _SPLIT
    lo = idx - hi * _SPLIT
    r = jnp.arange(_SPLIT, dtype=jnp.int32)
    P = (hi[..., None] == r).astype(dtype)
    Q = (lo[..., None] == r).astype(dtype)
    return P, Q


def _uniform_histograms(scaled, bins):
    """Batched np.histogram with uniform bins: ``scaled`` is (A, N) already
    mapped to bin space ([0, bins)); returns (A, bins) f32 counts.

    counts[a, 16h+l] = sum_n [hi==h][lo==l] — one batched 16x16 matmul on
    the MXU. On TPU the one-hots are int4: 0/1 products are exact in the
    int32 accumulator (counts < 2^31) and the 4x denser operands cut the
    HBM round-trip of the materialized (A, N, 16) one-hot pair — measured
    4x faster end-to-end at 1080p batch 4 than the bf16 form (PERF.md).
    bf16 elsewhere (int4 matmuls are TPU-only); exact too (counts < 2^24).
    """
    idx = jnp.clip(jnp.floor(scaled), 0, bins - 1).astype(jnp.int32)
    if jax.default_backend() == "tpu":
        P, Q = _onehot_pair(idx, dtype=jnp.int4)
        counts = jnp.einsum(
            "anh,anl->ahl", P, Q, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        P, Q = _onehot_pair(idx)
        counts = jnp.einsum(
            "anh,anl->ahl", P, Q, preferred_element_type=jnp.float32
        )
    return counts.reshape(scaled.shape[0], _SPLIT * _SPLIT)[:, :bins]


def _interp_small(x, xp, fp):
    """np.interp for a small monotone table (both ~bins long): index by
    comparison counting instead of searchsorted."""
    idx = jnp.sum(xp[None, :] < x[:, None], axis=1)  # == searchsorted left
    idx = jnp.clip(idx, 1, xp.shape[0] - 1)
    x0, x1 = xp[idx - 1], xp[idx]
    f0, f1 = fp[idx - 1], fp[idx]
    t = jnp.where(x1 > x0, (x - x0) / (x1 - x0), 0.0)
    out = f0 + t * (f1 - f0)
    out = jnp.where(x <= xp[0], fp[0], out)
    out = jnp.where(x >= xp[-1], fp[-1], out)
    return out


def _interp_uniform_tables(x, grid_lo, step, fp, left, right, right_edge):
    """Batched np.interp(x, xp, fp, left, right) where xp is the per-axis
    uniform grid ``grid_lo[a] + step[a] * arange(bins)``.

    x: (A, N); grid_lo/step/right_edge: (A,); fp: (A, bins). ``right_edge``
    is the exact last grid point (np.histogram's final edge == the data
    max): recomputing it as grid_lo + step*(n-1) can round BELOW the true
    max in f32, which would clamp the max-valued pixel to ``right`` —
    catastrophically wrong (`right` is in bin units).

    The fp[i], fp[i+1] lookups run as a one-hot MXU matmul (see
    ``_onehot_pair``): T = P @ [F|Fnext] selects each element's 16-entry
    table row exactly (HIGHEST precision keeps the f32 table values intact
    through the bf16 MXU passes), then a 16-way masked reduction picks the
    column."""
    a, _ = x.shape
    n = fp.shape[1]
    pos = (x - grid_lo[:, None]) / step[:, None]
    i = jnp.clip(jnp.floor(pos), 0, n - 2).astype(jnp.int32)
    frac = pos - i.astype(pos.dtype)

    fp_next = jnp.concatenate([fp[:, 1:], fp[:, -1:]], axis=1)
    pad = _SPLIT * _SPLIT - n
    F = jnp.pad(fp, ((0, 0), (0, pad))).reshape(a, _SPLIT, _SPLIT)
    Fn = jnp.pad(fp_next, ((0, 0), (0, pad))).reshape(a, _SPLIT, _SPLIT)
    W = jnp.concatenate([F, Fn], axis=2)  # (A, 16, 32)

    P, Q = _onehot_pair(i)
    T = jnp.einsum(
        "anh,ahk->ank",
        P,
        W,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    Qf = Q.astype(jnp.float32)
    v0 = jnp.sum(T[..., :_SPLIT] * Qf, axis=-1)
    v1 = jnp.sum(T[..., _SPLIT:] * Qf, axis=-1)

    val = v0 * (1.0 - frac) + v1 * frac
    val = jnp.where(x < grid_lo[:, None], left, val)
    val = jnp.where(x > right_edge[:, None], right, val)
    return val


_LANES = 128
_APPLY_MB = 32  # sublane rows per kernel block; >=64 miscompiles (Mosaic)


def _apply_kernel(scal_ref, x_ref, g_ref, out_ref):
    """Fused per-axis table interpolation (the IDT transport apply step).

    x: (3, mb, 128) f32 projections; g: (3, 4, 16, 16) bf16 — the transfer
    tables as hi/lo bf16 splits [F_hi | F_lo | Fnext_hi | Fnext_lo];
    scal: (3, 4) SMEM [grid_lo, step, right_edge, _].

    Layout is the whole trick: TPU has no per-lane gather and Mosaic can't
    reshape (mb, 128) -> (mb*128, 1), so the 16-way one-hots put their
    one-hot index on the LEADING (untiled) axis — P, Q: (16, mb, 128) —
    where building them is a plain broadcast compare, the table contraction
    S[h,s,l] = sum_g F[h,g] Q[g,s,l] is a legal dot_general, and the final
    row-pick is a multiply + leading-axis reduce. Everything stays in VMEM:
    the XLA einsum formulation round-trips ~2 GB/iteration of one-hots
    through HBM (10.6 ms vs 5.5 ms measured, batch-4 1080p).

    Precision story (round-4 re-measurement, tools/bench/ab_apply6_r4.py):
    the table values are f32, so a single one-pass bf16 dot costs ~0.5 of a
    bin. The round-3 fix (ONE dot at Precision.HIGHEST, exact) turned out
    ~10x slower than the split in the REAL vmapped context (112 vs 11 ms
    per batch-4 apply; the earlier "6.5x faster in-kernel" reading came
    from unvmapped isolated runs whose Mosaic schedule inverts the
    ordering). The production choice is the two-term bf16 split with bf16
    dot operands: F = F_hi + F_lo with F_hi = bf16(F); the selection error
    is bounded by the bf16 re-rounding of F_lo, i.e. 2^-18 * |F| — at most
    ~1e-3 of a bin (4e-6 in pixel units), 100x below 8-bit output
    quantization. Full-method: 79 fps vs 60 (HIGHEST) vs 64-68 (exact
    3-term split) at batch-4 1080p. CAUTION: the split MUST be built with
    ``lax.reduce_precision`` — this backend's XLA elides f32->bf16->f32
    cast round-trips under jit, which silently zeroes a cast-based F_lo
    (this bug shipped in rounds 1-2: the "split" kernel actually ran with
    F_lo == 0 and a 0.5-bin error).
    """
    mb = x_ref.shape[1]
    hgrid = lax.broadcasted_iota(jnp.int32, (16, mb, _LANES), 0)
    n = 255  # bins
    for a in range(3):
        grid_lo = scal_ref[a, 0]
        step = scal_ref[a, 1]
        right_edge = scal_ref[a, 2]
        x = x_ref[a]  # (mb, 128)
        pos = (x - grid_lo) / step
        i = jnp.clip(jnp.floor(pos), 0, n - 2).astype(jnp.int32)
        frac = pos - i.astype(jnp.float32)
        hi = i // 16
        lo = i - hi * 16
        P = (hi[None, :, :] == hgrid).astype(jnp.float32)  # (16, mb, 128)
        Q = (lo[None, :, :] == hgrid).astype(jnp.bfloat16)

        def table_select(F_hi, F_lo):
            def dot(F):
                # bf16 x bf16 one-pass: exact for one-hot Q and bf16 F.
                return jax.lax.dot_general(
                    F, Q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            return jnp.sum(P * (dot(F_hi) + dot(F_lo)), axis=0)  # (mb, 128)

        v0 = table_select(g_ref[a, 0], g_ref[a, 1])
        v1 = table_select(g_ref[a, 2], g_ref[a, 3])
        val = v0 * (1.0 - frac) + v1 * frac
        val = jnp.where(x < grid_lo, 0.0, val)
        val = jnp.where(x > right_edge, float(n), val)
        out_ref[a] = val


def _apply_tables_pallas(d0, grid_lo, step, fp, right_edge, interpret=False):
    """Pallas path of the transport apply: d0 (3, N) -> transported (3, N).

    fp: (3, bins) f32 transfer tables. Pads N to the kernel block, packs
    the tables as hi/lo bf16-split 16x16 grids, and launches
    ``_apply_kernel``."""
    _, n_pix = d0.shape
    bins = fp.shape[1]
    blk = _APPLY_MB * _LANES
    n_pad = -(-n_pix // blk) * blk
    x = jnp.pad(d0, ((0, 0), (0, n_pad - n_pix)), constant_values=0.0)
    x = x.reshape(3, n_pad // _LANES, _LANES)

    fp_next = jnp.concatenate([fp[:, 1:], fp[:, -1:]], axis=1)
    pad_t = 256 - bins

    def grid16(t):
        return jnp.pad(t, ((0, 0), (0, pad_t))).reshape(3, 16, 16)

    def split(t):
        t = grid16(t)
        # reduce_precision, NOT astype: XLA elides cast round-trips (see
        # _apply_kernel docstring), which would zero the lo term.
        t_hi = lax.reduce_precision(t, exponent_bits=8, mantissa_bits=7)
        return t_hi, t - t_hi

    g = jnp.stack([*split(fp), *split(fp_next)], axis=1).astype(
        jnp.bfloat16
    )  # (3, 4, 16, 16)

    scal = jnp.stack(
        [grid_lo, step, right_edge, jnp.zeros_like(step)], axis=1
    ).astype(jnp.float32)

    out = pl.pallas_call(
        _apply_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(x.shape[1] // _APPLY_MB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, _APPLY_MB, _LANES), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, _APPLY_MB, _LANES), lambda i: (0, i, 0)),
        interpret=interpret,
    )(scal, x, g)
    return out.reshape(3, n_pad)[:, :n_pix]


def _histogram_transfer_axes(d0, d1, bins):
    """CDF matching of all rotated axes at once
    (reference methods/iterative.py:39-53).

    d0, d1: (3, N) projections of target/reference. Returns transported d0.
    """
    lo = jnp.minimum(d0.min(axis=1), d1.min(axis=1))  # (3,)
    hi = jnp.maximum(d0.max(axis=1), d1.max(axis=1))
    step = (hi - lo) / bins

    # Histogram target and reference separately: their pixel counts may
    # differ (a reference image of another size is a normal use).
    def cdf(d):
        scaled = (d - lo[:, None]) / (hi - lo)[:, None] * bins
        counts = _uniform_histograms(scaled, bins)  # (3, bins)
        cp = jnp.cumsum(counts, axis=1)
        return cp / cp[:, -1:]

    cp0, cp1 = cdf(d0), cdf(d1)

    # f maps target-quantiles onto reference bin positions (edges[1:]); then
    # transport each sample. left=0 / right=bins mirror the reference's
    # np.interp args (reference methods/iterative.py:51-53).
    edges_tail = lo[:, None] + step[:, None] * jnp.arange(1, bins + 1)
    f = jax.vmap(_interp_small)(cp0, cp1, edges_tail)  # (3, bins)
    if bins == 255 and jax.default_backend() == "tpu":
        # Fused Pallas apply (left edge == 0.0 is built into the kernel).
        return _apply_tables_pallas(
            d0, grid_lo=lo + step, step=step, fp=f, right_edge=hi
        )
    return _interp_uniform_tables(
        d0,
        grid_lo=lo + step,
        step=step,
        fp=f,
        left=0.0,
        right=float(bins),
        right_edge=hi,  # the exact final histogram edge (== joint max)
    )


def random_rotations(key, n_iter, dim=3):
    """Haar-random 3D rotations (det +1) replacing scipy special_ortho_group.

    Built by modified Gram-Schmidt over Gaussian columns plus a cross
    product for the third axis (always det +1). This replaces
    ``jax.random.orthogonal``/``jnp.linalg.qr``, whose XLA lowering returns
    matrices with ~4e-3 orthogonality error in f32 — far too sloppy to use
    ``rot.T`` as the inverse in the IDT de-rotation step (MGS is ~1e-7)."""
    if dim != 3:
        raise ValueError("random_rotations supports dim=3 (color axes) only")
    g = jax.random.normal(key, (n_iter, dim, dim))
    c0 = g[:, :, 0]
    c0 = c0 / jnp.linalg.norm(c0, axis=1, keepdims=True)
    c1 = g[:, :, 1] - jnp.sum(c0 * g[:, :, 1], axis=1, keepdims=True) * c0
    c1 = c1 / jnp.linalg.norm(c1, axis=1, keepdims=True)
    c2 = jnp.cross(c0, c1)
    return jnp.stack([c0, c1, c2], axis=2)


@partial(jax.jit, static_argnames=("bins", "n_iter"))
def iterative_distribution_transfer(
    target, reference, bins=255, n_iter=4, key=None
):
    """Iterative Distribution Transfer (Pitié et al. 2007).

    target/reference: (H, W, 3) in [0, 1] (any shape (..., 3) works).
    Matches reference methods/iterative.py:8-59 with a seeded rotation set.
    """
    if bins > _SPLIT * _SPLIT:
        # The MXU one-hot decomposition covers indices < 16*16; larger bin
        # counts would silently drop samples from the histograms.
        raise ValueError(
            f"bins must be <= {_SPLIT * _SPLIT} (got {bins}): the histogram/"
            "table kernels decompose bin indices into two 16-way one-hots"
        )
    if key is None:
        key = jax.random.PRNGKey(42)
    shape = target.shape
    t = target.reshape(-1, 3)
    r = reference.reshape(-1, 3)

    rotations = random_rotations(key, n_iter)

    # HIGHEST keeps the projections in true f32: the default bf16 matmul
    # noise (~1e-3) is a quarter of a histogram bin's width.
    mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)

    def body(t_cur, rot):
        d0r = mm(rot, t_cur.T)  # (3, N)
        d1r = mm(rot, r.T)
        d_r = _histogram_transfer_axes(d0r, d1r, bins)
        # rot is orthogonal with det +1, so solve(rot, x) == rot.T @ x —
        # the broadcast 3x3 triangular solve costs ~100 ms/batch4 @1080p on
        # TPU while the transposed matmul is free (measured ablation).
        t_next = mm(rot.T, d_r - d0r).T + t_cur
        return t_next, None

    t_out, _ = lax.scan(body, t, rotations)
    return t_out.reshape(shape)


def _shift_down(a):  # first_pad_0: rows shifted down, edge row repeated
    return jnp.concatenate([a[:1], a[:-1]], axis=0)


def _shift_right(a):  # first_pad_1
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)


def _shift_up(a):  # last_pad_0
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def _shift_left(a):  # last_pad_1
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def _solve_invariants(img_in, img_col, level, eps=1e-6, rho=1.0 / 5.0):
    """The sweep's loop-invariant fields (reference methods/iterative.py:80-105):
    edge-adaptive weights phi1..4, the folded constant term and the damped
    inverse denominator. Hoisted out of the Jacobi loop — the sweeps are
    HBM-bound and this nearly halves per-sweep arithmetic and read traffic."""
    delta_x = _shift_left(img_in) - _shift_right(img_in)
    delta_y = _shift_up(img_in) - _shift_down(img_in)
    delta = jnp.sqrt((delta_x**2 + delta_y**2).sum(axis=2, keepdims=True))

    psi = jnp.minimum(256.0 * delta / 5.0, 1.0)
    phi = 30.0 * 2.0 ** (-level) / (1.0 + 10.0 * delta)

    phi1 = (_shift_left(phi) + phi) / 2.0
    phi2 = (_shift_up(phi) + phi) / 2.0
    phi3 = (_shift_right(phi) + phi) / 2.0
    phi4 = (_shift_down(phi) + phi) / 2.0

    den = psi + phi1 + phi2 + phi3 + phi4 + eps

    const = (
        psi * img_col
        + phi1 * (img_in - _shift_left(img_in))
        + phi2 * (img_in - _shift_up(img_in))
        + phi3 * (img_in - _shift_right(img_in))
        + phi4 * (img_in - _shift_down(img_in))
    )
    return const, (phi1, phi2, phi3, phi4), (1.0 - rho) / den


def _solve(img_out, img_in, img_col, nbit, level, eps=1e-6, rho=1.0 / 5.0):
    """Gradient-preserving fixed-point sweep (reference methods/iterative.py:80-115)."""
    const, (phi1, phi2, phi3, phi4), inv_den_damped = _solve_invariants(
        img_in, img_col, level, eps=eps, rho=rho
    )

    # The sweeps carry no data besides these loop-invariants, so the whole
    # level can run as ONE Pallas launch with every array VMEM-resident
    # (ops/regrain_stencil.py) — the XLA path dispatches nbit separate
    # programs, which dominates at the small pyramid levels where most of
    # the (4,16,32,64,64,64) sweep budget lives.
    from color_transfer_tpu.ops.regrain_stencil import (
        level_fits_vmem,
        regrain_sweeps_pallas,
    )

    h, w, _ = img_in.shape
    if jax.default_backend() == "tpu" and level_fits_vmem(h, w):
        phis = jnp.stack(
            [phi1[..., 0], phi2[..., 0], phi3[..., 0], phi4[..., 0]]
        )
        return regrain_sweeps_pallas(
            img_out, const, phis, inv_den_damped[..., 0], nbit, rho=rho
        )

    def sweep(_, out):
        num = (
            const
            + phi1 * _shift_left(out)
            + phi2 * _shift_up(out)
            + phi3 * _shift_right(out)
            + phi4 * _shift_down(out)
        )
        return num * inv_den_damped + rho * out

    return lax.fori_loop(0, nbit, sweep, img_out)


def _regrain(img_in, img_col, nbits=(4, 16, 32, 64, 64, 64), level=0):
    """Multiscale regrain pyramid (reference methods/iterative.py:62-77).

    Shapes are static, so the recursion unrolls at trace time.
    """
    h, w, _ = img_in.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2

    if len(nbits) > 1 and h2 > 20 and w2 > 20:
        ch = jnp.moveaxis  # channels-first helpers for the resize core
        small_in = ch(resize_antialias(ch(img_in, -1, 0), (h2, w2)), 0, -1)
        small_col = ch(resize_antialias(ch(img_col, -1, 0), (h2, w2)), 0, -1)
        small_out = _regrain(small_in, small_col, nbits[1:], level + 1)
        img_out = ch(resize_bilinear(ch(small_out, -1, 0), (h, w)), 0, -1)
    else:
        img_out = img_in

    return _solve(img_out, img_in, img_col, nbits[0], level)


@partial(jax.jit, static_argnames=("bins", "n_iter"))
def automated_color_grading(target, reference, bins=255, n_iter=4, key=None):
    """Automated Colour Grading (Pitié et al. 2007): IDT + regrain
    (reference methods/iterative.py:118-138)."""
    graded = iterative_distribution_transfer(
        target, reference, bins=bins, n_iter=n_iter, key=key
    )
    return _regrain(target, graded)
