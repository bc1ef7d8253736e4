"""Unrolled small-matrix linear algebra for TPU.

XLA's LAPACK-style `cholesky`/`triangular_solve` lower to loop-heavy code that
is catastrophically slow for batched tiny matrices (nv = 17-26 here) — they
dominated the first TPU profile of the physics step.  These versions unroll
over the static dimension n, so the whole factor+solve becomes one flat chain
of ~n²/2 fused multiply-adds on (batch,)-shaped vectors: pure VPU work with no
control flow, vmap-friendly in any batch layout.

Used for M⁻¹ (qacc_smooth) and the Newton solver's H⁻¹ (solver.py).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chol_factor", "chol_solve", "solve_psd"]


def chol_factor(a: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky factor of (..., n, n) SPD matrices, unrolled."""
    n = a.shape[-1]
    cols = []  # cols[j]: (..., n) column j of L (zeros above diagonal)
    for j in range(n):
        s = a[..., :, j]
        for k in range(j):
            s = s - cols[k] * cols[k][..., j : j + 1]
        d = jnp.sqrt(jnp.maximum(s[..., j : j + 1], 1e-30))
        col = s / d
        # zero the strictly-upper part of this column
        if j > 0:
            mask = jnp.concatenate(
                [jnp.zeros(j, a.dtype), jnp.ones(n - j, a.dtype)]
            )
            col = col * mask
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def _solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L x = b with L (..., n, n) lower triangular, b (..., n); unrolled."""
    n = b.shape[-1]
    xs = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * xs[k]
        xs.append(s / L[..., i, i])
    return jnp.stack(xs, axis=-1)


def _solve_upper_t(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lᵀ x = b (backward substitution), unrolled."""
    n = b.shape[-1]
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        s = b[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * xs[k]
        xs[i] = s / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def chol_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = chol_factor(A)."""
    return _solve_upper_t(L, _solve_lower(L, b))


def solve_psd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD system a x = b, unrolled Cholesky."""
    return chol_solve(chol_factor(a), b)
