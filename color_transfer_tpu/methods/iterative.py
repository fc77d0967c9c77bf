"""Iterative distribution transfer and automated color grading, on-device.

TPU-first re-design of the reference's Pitié et al. methods
(reference methods/iterative.py). Key transformations:

  * The per-iteration random SO(3) rotation (reference :32 uses
    scipy.stats.special_ortho_group) becomes a batch of Haar-orthogonal
    matrices from ``jax.random.orthogonal`` with determinant fixed to +1 —
    statistically equivalent, seeded and reproducible.
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

from color_transfer_tpu.core.resize import resize_antialias, resize_bilinear


def _uniform_histogram(x, lo, hi, bins):
    """np.histogram with uniform bins, TPU-fast: bucket by index arithmetic
    and count with an equality-compare reduction (searchsorted/scatter-based
    histograms cost ~200 ms for a 1080p frame on TPU; this is ~5 ms)."""
    scaled = (x - lo) / (hi - lo) * bins
    idx = jnp.clip(jnp.floor(scaled), 0, bins - 1).astype(jnp.int32)
    # (N, 1) == (1, bins) -> column sums. XLA tiles this as a fused reduce.
    return jnp.sum(
        idx[:, None] == jnp.arange(bins, dtype=jnp.int32)[None, :],
        axis=0,
        dtype=jnp.float32,
    )


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


def _interp_uniform_grid(x, grid_lo, step, fp, left, right):
    """np.interp(x, xp, fp, left, right) where xp is the uniform grid
    ``grid_lo + step * arange(len(fp))`` — direct index arithmetic.

    The two table lookups fp[i], fp[i+1] run as one equality-compare
    reduction instead of gathers (TPU gathers of 2M+ scalar indices cost
    ~150 ms/frame; the fused compare pass is ~10x cheaper)."""
    n = fp.shape[0]
    pos = (x - grid_lo) / step
    i = jnp.clip(jnp.floor(pos), 0, n - 2).astype(jnp.int32)
    frac = pos - i.astype(pos.dtype)

    fp_next = jnp.concatenate([fp[1:], fp[-1:]])
    eq = i[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
    v0 = jnp.sum(jnp.where(eq, fp[None, :], 0.0), axis=1)
    v1 = jnp.sum(jnp.where(eq, fp_next[None, :], 0.0), axis=1)

    val = v0 * (1.0 - frac) + v1 * frac
    val = jnp.where(x < grid_lo, left, val)
    val = jnp.where(x > grid_lo + step * (n - 1), right, val)
    return val


def _histogram_transfer_axis(d0, d1, bins):
    """CDF matching of one rotated axis (reference methods/iterative.py:39-53).

    d0, d1: (N,) projections of target/reference. Returns transported d0.
    """
    lo = jnp.minimum(d0.min(), d1.min())
    hi = jnp.maximum(d0.max(), d1.max())
    step = (hi - lo) / bins

    p0 = _uniform_histogram(d0, lo, hi, bins)
    p1 = _uniform_histogram(d1, lo, hi, bins)

    cp0 = jnp.cumsum(p0)
    cp0 = cp0 / cp0[-1]
    cp1 = jnp.cumsum(p1)
    cp1 = cp1 / cp1[-1]

    # f maps target-quantiles onto reference bin positions (edges[1:]); then
    # transport each sample. left=0 / right=bins mirror the reference's
    # np.interp args (reference methods/iterative.py:51-53).
    edges_tail = lo + step * jnp.arange(1, bins + 1)
    f = _interp_small(cp0, cp1, edges_tail)
    return _interp_uniform_grid(
        d0, grid_lo=lo + step, step=step, fp=f, left=0.0, right=float(bins)
    )


def random_rotations(key, n_iter, dim=3):
    """Haar-random rotations (det +1) replacing scipy special_ortho_group."""
    q = jax.random.orthogonal(key, dim, shape=(n_iter,))
    det = jnp.linalg.det(q)
    # Flip the first row where det == -1 to land in SO(dim).
    flip = jnp.where(det[:, None] < 0, -1.0, 1.0)
    return q.at[:, 0, :].multiply(flip)


@partial(jax.jit, static_argnames=("bins", "n_iter"))
def iterative_distribution_transfer(
    target, reference, bins=255, n_iter=4, key=None
):
    """Iterative Distribution Transfer (Pitié et al. 2007).

    target/reference: (H, W, 3) in [0, 1] (any shape (..., 3) works).
    Matches reference methods/iterative.py:8-59 with a seeded rotation set.
    """
    if key is None:
        key = jax.random.PRNGKey(42)
    shape = target.shape
    t = target.reshape(-1, 3)
    r = reference.reshape(-1, 3)

    rotations = random_rotations(key, n_iter)

    transfer = jax.vmap(_histogram_transfer_axis, in_axes=(0, 0, None))

    def body(t_cur, rot):
        d0r = rot @ t_cur.T  # (3, N)
        d1r = rot @ r.T
        d_r = transfer(d0r, d1r, bins)
        t_next = jnp.linalg.solve(rot, d_r - d0r).T + t_cur
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


def _solve(img_out, img_in, img_col, nbit, level, eps=1e-6, rho=1.0 / 5.0):
    """Gradient-preserving fixed-point sweep (reference methods/iterative.py:80-115)."""
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

    def sweep(_, out):
        num = (
            psi * img_col
            + phi1 * (_shift_left(out) - _shift_left(img_in) + img_in)
            + phi2 * (_shift_up(out) - _shift_up(img_in) + img_in)
            + phi3 * (_shift_right(out) - _shift_right(img_in) + img_in)
            + phi4 * (_shift_down(out) - _shift_down(img_in) + img_in)
        )
        return num / den * (1.0 - rho) + rho * out

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
