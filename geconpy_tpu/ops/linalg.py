"""Batched small-matrix linear algebra tuned for TPU.

XLA's batched LU / Cholesky / triangular solves factorize sequentially per
batch element on TPU; for the n ~ 10-40 matrices that dominate DSGE hot
paths, an *unrolled* Gauss-Jordan elimination — n static steps, each a
batch-vectorized rank-1 update — is much faster under ``vmap`` (same insight
as ``ops/kalman.py::_spd_inverse``, which handles the no-pivot SPD case).

These are general-matrix variants with partial (row) pivoting via one-hot
``argmax`` selection, so they stay correct on the indefinite pencil blocks
(``B + C T``) where diagonal pivots can vanish.  Singular inputs produce
inf/nan that downstream success flags catch — never an exception (vmap
safety for batched MCMC draws).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gj_solve", "gj_inverse"]


def _gj_elimination(M: jax.Array, B: jax.Array) -> jax.Array:
    # Row selection/swap uses one-hot masked reductions, NOT dynamic
    # gather/scatter: `A[p]` / `A.at[p].set` with a traced (vmap-batched)
    # index lowers to generic gather/scatter that is ~3x slower on TPU bare
    # and pathological (~30x) inside differentiated graphs (measured on the
    # SW-2007 adjoint path).  Static-index ops on row i are fine.
    n = M.shape[-1]
    A = jnp.concatenate([M, B], axis=-1)            # (n, n + k)
    rows = jnp.arange(n)
    for i in range(n):
        col = jnp.abs(A[:, i])
        col = jnp.where(rows >= i, col, -jnp.inf)   # only unreduced rows
        p = jnp.argmax(col)
        oh_p = (rows == p)[:, None]                 # (n, 1)
        row_i = A[i]                                # static index
        row_p = jnp.sum(jnp.where(oh_p, A, 0), axis=0)   # one-hot "A[p]"
        A = jnp.where(oh_p, row_i[None, :], A)      # one-hot "A[p] = row_i"
        piv = row_p / row_p[i]
        A = A - A[:, i:i + 1] * piv[None, :]
        A = A.at[i].set(piv)                        # static index
    return A[:, n:]


def gj_solve(M: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``M X = B`` by unrolled partially-pivoted Gauss-Jordan.

    ``M`` is (n, n), ``B`` is (n, k).  All operations are elementwise /
    rank-1 over the trailing axes, so the whole solve vectorizes cleanly
    over any leading vmap batch — replacing ``lu_factor``/``lu_solve``
    (sequential per batch element on TPU) on batched hot paths.

    Wrapped in ``lax.custom_linear_solve`` so BOTH autodiff modes use the
    implicit linear-solve rules (tangent/adjoint = one more Gauss-Jordan
    solve) instead of unrolled-elimination autodiff.  Forward mode matters:
    ``jax.hessian`` / HVP-based machinery (MAP Newton polish, Laplace
    evidence, curvature-seeded NUTS mass) runs jacfwd over the log
    posterior, and a ``custom_vjp`` here would reject it.
    """

    def matvec(x):
        return M @ x

    def solve(_mv, b):
        return _gj_elimination(M, b)

    def transpose_solve(_vm, b):
        return _gj_elimination(M.T, b)

    return jax.lax.custom_linear_solve(matvec, B, solve, transpose_solve)


def gj_inverse(M: jax.Array) -> jax.Array:
    """Inverse of a general (n, n) matrix by pivoted Gauss-Jordan (see
    :func:`gj_solve`)."""
    n = M.shape[-1]
    return gj_solve(M, jnp.eye(n, dtype=M.dtype))
