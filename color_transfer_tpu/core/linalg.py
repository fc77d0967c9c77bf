"""Small-matrix linear algebra for the global transfer methods.

The reference's Monge-Kantorovitch and correlated-color-space transfers need
3x3 covariance matrices, their SVD, inverse and matrix square root
(reference methods/linear.py:66-78,:105-118, which call numpy.linalg.svd and
scipy.linalg.sqrtm). Covariances are symmetric PSD, so the square root is
computed by symmetric eigendecomposition — TPU-friendly (no Schur
decomposition) and differentiable.
"""

import jax.numpy as jnp


def cov3(x):
    """Covariance of (N, 3) samples, matching np.cov(x.T) (ddof=1)."""
    n = x.shape[0]
    mean = jnp.mean(x, axis=0, keepdims=True)
    centered = x - mean
    return (centered.T @ centered) / (n - 1)


def sqrtm_psd(a, eps=1e-12):
    """Matrix square root of a symmetric PSD matrix via eigendecomposition.

    Equivalent to scipy.linalg.sqrtm for SPD inputs (reference
    methods/linear.py:113-118) but maps to eigh, which XLA lowers natively.
    """
    vals, vecs = jnp.linalg.eigh(a)
    vals = jnp.sqrt(jnp.maximum(vals, eps))
    return (vecs * vals) @ vecs.T


def inv_sqrtm_psd(a, eps=1e-12):
    """Inverse matrix square root of a symmetric PSD matrix."""
    vals, vecs = jnp.linalg.eigh(a)
    vals = 1.0 / jnp.sqrt(jnp.maximum(vals, eps))
    return (vecs * vals) @ vecs.T


def solve3(a, b):
    """Solve a (3,3) @ x = b; thin wrapper for readability at call sites
    (reference methods/iterative.py:55 uses np.linalg.solve to de-rotate)."""
    return jnp.linalg.solve(a, b)
