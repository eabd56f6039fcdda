"""Block-tridiagonal linear solve as a lax.scan (block Thomas algorithm).

Replaces the reference's scipy.sparse LU over the stacked perfect-foresight
Jacobian (``gEconpy/model/perfect_foresight/assemble.py:8`` +
``solvers/sparse_root/direction.py``): the stacked-time system is
block-tridiagonal by construction, so an O(T n^3) forward-elimination /
back-substitution pair of scans beats generic sparse LU and keeps everything
on device with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["solve_block_tridiagonal"]


@highest_precision
def solve_block_tridiagonal(A, B, C, d):
    """Solve the block-tridiagonal system

        A[t] x[t-1] + B[t] x[t] + C[t] x[t+1] = d[t],   t = 0..T-1

    with A[0] and C[T-1] ignored (no x[-1] / x[T] terms).

    Shapes: A, B, C are (T, n, n); d is (T, n).  Returns x of shape (T, n).
    """
    T, n, _ = B.shape

    # forward elimination:
    #   W[t] = (B[t] - A[t] W'[t-1])^{-1} C[t]
    #   g[t] = (B[t] - A[t] W'[t-1])^{-1} (d[t] - A[t] g[t-1])
    def forward(carry, inputs):
        W_prev, g_prev = carry
        A_t, B_t, C_t, d_t = inputs
        M = B_t - A_t @ W_prev
        # one LU, two right-hand sides
        rhs = jnp.concatenate([C_t, (d_t - A_t @ g_prev)[:, None]], axis=1)
        sol = jnp.linalg.solve(M, rhs)
        W_t = sol[:, :n]
        g_t = sol[:, n]
        return (W_t, g_t), (W_t, g_t)

    zeros_W = jnp.zeros((n, n), B.dtype)
    zeros_g = jnp.zeros((n,), B.dtype)
    _, (W, g) = jax.lax.scan(forward, (zeros_W, zeros_g), (A, B, C, d))

    # back substitution: x[T-1] = g[T-1]; x[t] = g[t] - W[t] x[t+1]
    def backward(x_next, inputs):
        W_t, g_t = inputs
        x_t = g_t - W_t @ x_next
        return x_t, x_t

    _, xs_rev = jax.lax.scan(backward, jnp.zeros((n,), B.dtype),
                             (W, g), reverse=True)
    return xs_rev
