"""Chandrasekhar recursions: exact Kalman likelihood at O(n^2 k) per step.

For time-invariant state-space models the covariance recursion's *increment*
has rank <= k_obs: P_{t+1} - P_t = W_t M_t W_t' with W (n x k), M (k x k)
(Morf-Sidhu-Kailath; Herbst 2015, "Using the 'Chandrasekhar recursions' for
likelihood evaluation of DSGE models", J. Econ. Dynamics & Control).
Propagating (F, K, W, M) instead of the full P replaces the three n x n x n
matmuls per step with n x n x k ones — a ~n/k speedup of the exact filter,
which for SW-2007 (n=33, k=7) is the difference between missing and beating
the per-draw latency target.

Requirements: time-invariant (T, R, Q, Z, H), no missing observations, and a
stationary initial covariance (P1 = T P1 T' + R Q R'), which is exactly how
the DSGE likelihood is initialized.  Exact — not an approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["chandrasekhar_loglik"]

_LOG2PI = 1.8378770664093453


@highest_precision
def chandrasekhar_loglik(y, T, R, Q, Z, H, d=None, x0=None, P0=None):
    """Exact log-likelihood via the Chandrasekhar recursions.

    Same interface as :func:`geconpy_tpu.ops.kalman.kalman_loglik`; ``P0``
    defaults to the stationary covariance (doubling Lyapunov solve), which
    the recursion initialization requires.
    """
    y = jnp.asarray(y)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    dtype = T.dtype
    Q = jnp.asarray(Q, dtype)
    Z = jnp.asarray(Z, dtype)
    H = jnp.asarray(H, dtype)
    n = T.shape[0]
    k = Z.shape[0]
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    if P0 is None:
        from .lyapunov import solve_discrete_lyapunov

        P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    P0 = jnp.asarray(P0, dtype)

    # stationary init: predicted P_1 = T P0 T' + RQR' = P0
    F1 = Z @ P0 @ Z.T + H
    G1 = T @ P0 @ Z.T                       # (n, k)
    chol1 = jnp.linalg.cholesky(F1)
    K1 = jax.scipy.linalg.cho_solve((chol1, True), G1.T).T
    W1 = K1
    M1 = -F1
    x1 = T @ jnp.asarray(x0, dtype)

    def step(carry, y_t):
        x, F, G, K, W, M = carry
        chol = jnp.linalg.cholesky(F)
        v = y_t - Z @ x - d
        w = jax.scipy.linalg.cho_solve((chol, True), v)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        ll_t = -0.5 * (k * _LOG2PI + logdet + v @ w)

        x_next = T @ x + K @ v

        ZW = Z @ W                            # (k, k)
        MZWt = M @ ZW.T                       # (k, k)
        F_next = F + ZW @ MZWt
        F_next = 0.5 * (F_next + F_next.T)
        G_next = G + T @ (W @ MZWt)           # (n, k)
        chol_next = jnp.linalg.cholesky(F_next)
        K_next = jax.scipy.linalg.cho_solve((chol_next, True), G_next.T).T
        # Morf-Sidhu-Kailath: M_{t+1} = M_t - M_t (ZW)' F_{t+1}^{-1} (ZW) M_t
        M_next = M - MZWt @ jax.scipy.linalg.cho_solve((chol_next, True),
                                                       ZW @ M)
        M_next = 0.5 * (M_next + M_next.T)
        W_next = T @ W - K @ ZW               # (T - K_t Z) W_t

        return (x_next, F_next, G_next, K_next, W_next, M_next), ll_t

    carry0 = (x1, F1, G1, K1, W1, M1)
    _, ll_t = jax.lax.scan(step, carry0, y)
    ll = jnp.sum(ll_t)
    return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
