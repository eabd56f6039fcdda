"""Parallel-in-time Kalman filter via associative scan.

The sequential filter's 200-step ``lax.scan`` is latency-bound on TPU: each
step is a handful of tiny matmuls that cannot saturate the MXU.  Kalman
filtering is associative (Särkkä & García-Fernández, "Temporal
Parallelization of Bayesian Smoothers", IEEE TAC 2021 — see PAPERS.md), so
the whole recursion runs as a ``jax.lax.associative_scan`` with O(log T)
depth, where every combination step is a *batched* set of n x n solves and
GEMMs over the time axis — exactly the shape the MXU wants.

Each time step carries the five-tuple element (A, b, C, eta, J):

    p(x_k | x_{k-1}, y_k) = N(x_k; A_k x_{k-1} + b_k, C_k)

with (eta, J) the information-form message for the likelihood backward pass.
The prefix products give the filtered moments directly:
(e_1 * ... * e_k).b = E[x_k | y_{1:k}],  .C = Cov[x_k | y_{1:k}].

The log-likelihood needs only the one-step-ahead predictions, which are
elementwise in k once the filtered moments exist — one batched Cholesky over
(T, k_obs, k_obs) at the end.

Missing data uses the same masking transform as the sequential kernel
(rows of H neutralized, unit pseudo-variance, observed-count-aware
constants), so elements stay time-varying but statically shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["parallel_kalman_filter", "parallel_kalman_loglik"]

_LOG2PI = 1.8378770664093453


class _Element(NamedTuple):
    A: jax.Array      # (T, n, n)
    b: jax.Array      # (T, n)
    C: jax.Array      # (T, n, n)
    eta: jax.Array    # (T, n)
    J: jax.Array      # (T, n, n)


def _combine(left: _Element, right: _Element) -> _Element:
    """Associative combination of filtering elements (batched over time)."""
    A_i, b_i, C_i, eta_i, J_i = left
    A_j, b_j, C_j, eta_j, J_j = right
    n = A_i.shape[-1]
    eye = jnp.eye(n, dtype=A_i.dtype)

    # M = I + C_i J_j ;  solve once, reuse for the three A_j M^{-1} ... terms
    M = eye + C_i @ J_j
    # A_j M^{-1} X  ==  A_j @ solve(M, X)
    MinvA_i = jnp.linalg.solve(M, A_i)
    Minv_bCeta = jnp.linalg.solve(
        M, (b_i + jnp.einsum("...ij,...j->...i", C_i, eta_j))[..., None]
    )[..., 0]
    MinvC_i = jnp.linalg.solve(M, C_i)

    A = A_j @ MinvA_i
    b = jnp.einsum("...ij,...j->...i", A_j, Minv_bCeta) + b_j
    C = A_j @ MinvC_i @ jnp.swapaxes(A_j, -1, -2) + C_j
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))

    # L = I + J_j C_i = M^T (C, J symmetric)
    Lt = jnp.swapaxes(M, -1, -2)
    rhs = (eta_j - jnp.einsum("...ij,...j->...i", J_j, b_i))[..., None]
    Linv_rhs = jnp.linalg.solve(Lt, rhs)[..., 0]
    LinvJA = jnp.linalg.solve(Lt, J_j @ A_i)

    A_iT = jnp.swapaxes(A_i, -1, -2)
    eta = jnp.einsum("...ij,...j->...i", A_iT, Linv_rhs) + eta_i
    J = A_iT @ LinvJA + J_i
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return _Element(A, b, C, eta, J)


def _masked_obs(y, Z, H, d):
    """Per-step masked observation model (NaN = missing)."""
    mask = jnp.isfinite(y)
    maskf = mask.astype(Z.dtype)
    y_eff = jnp.where(mask, y, 0.0)
    Z_eff = Z * maskf[:, None]
    H_eff = H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)
    d_eff = d * maskf
    return y_eff, Z_eff, H_eff, d_eff, maskf


@highest_precision
def parallel_kalman_filter(y, T, R, Q, Z, H, d=None, x0=None, P0=None):
    """Associative-scan Kalman filter.

    Same inputs/semantics as :func:`geconpy_tpu.ops.kalman.kalman_filter`;
    returns (loglik, loglik_t, filtered_mean, filtered_cov,
    predicted_mean, predicted_cov).
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
    periods = y.shape[0]
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    if P0 is None:
        from .lyapunov import solve_discrete_lyapunov

        P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    Qt = R @ Q @ R.T
    # regularize: the process noise can be singular (fewer shocks than
    # states); the element construction solves with S = Z Qt Z^T + H which
    # stays SPD through H / the missing-row pseudo-variance, but C_i J_j
    # chains are better conditioned with a tiny jitter
    eps = jnp.asarray(1e-12, dtype) * (jnp.trace(Qt) / n + 1.0)
    Qt = Qt + eps * jnp.eye(n, dtype=dtype)

    y_eff, Z_eff, H_eff, d_eff, maskf = jax.vmap(
        lambda yt: _masked_obs(yt, Z, H, d))(y)
    y_c = y_eff - d_eff   # fold the intercept into the data

    # ---- generic elements (k >= 2)
    def make_element(y_t, Z_t, H_t):
        S = Z_t @ Qt @ Z_t.T + H_t
        chol = jnp.linalg.cholesky(S)
        SinvZ = jax.scipy.linalg.cho_solve((chol, True), Z_t)   # S^{-1} Z
        K = Qt @ SinvZ.T                                        # Q Z' S^{-1}
        IKZ = jnp.eye(n, dtype=dtype) - K @ Z_t
        A = IKZ @ T
        b = K @ y_t
        C = IKZ @ Qt
        C = 0.5 * (C + C.T)
        eta = T.T @ Z_t.T @ jax.scipy.linalg.cho_solve((chol, True), y_t)
        J = T.T @ Z_t.T @ SinvZ @ T
        J = 0.5 * (J + J.T)
        return _Element(A, b, C, eta, J)

    elems = jax.vmap(make_element)(y_c, Z_eff, H_eff)

    # ---- first element: prior-aware update
    m1_pred = T @ x0
    P1_pred = T @ P0 @ T.T + Qt
    Z1, H1, y1 = Z_eff[0], H_eff[0], y_c[0]
    S1 = Z1 @ P1_pred @ Z1.T + H1
    chol1 = jnp.linalg.cholesky(S1)
    K1 = P1_pred @ Z1.T @ jax.scipy.linalg.cho_solve(
        (chol1, True), jnp.eye(k, dtype=dtype))
    b1 = m1_pred + K1 @ (y1 - Z1 @ m1_pred)
    C1 = P1_pred - K1 @ Z1 @ P1_pred
    C1 = 0.5 * (C1 + C1.T)
    elems = _Element(
        elems.A.at[0].set(jnp.zeros((n, n), dtype)),
        elems.b.at[0].set(b1),
        elems.C.at[0].set(C1),
        elems.eta.at[0].set(jnp.zeros((n,), dtype)),
        elems.J.at[0].set(jnp.zeros((n, n), dtype)),
    )

    prefix = jax.lax.associative_scan(_combine, elems)
    filtered_mean = prefix.b                      # (T, n)
    filtered_cov = prefix.C                       # (T, n, n)

    # ---- one-step-ahead predictions (elementwise in t)
    prev_mean = jnp.concatenate([x0[None], filtered_mean[:-1]], axis=0)
    prev_cov = jnp.concatenate([P0[None].astype(dtype), filtered_cov[:-1]],
                               axis=0)
    pred_mean = jnp.einsum("ij,tj->ti", T, prev_mean)
    pred_cov = jnp.einsum("ij,tjk,lk->til", T, prev_cov, T) + Qt[None]

    # ---- log-likelihood from the innovations (batched Cholesky over t)
    def loglik_t(y_t, Z_t, H_t, mp, Pp, nobs):
        v = y_t - Z_t @ mp
        S = Z_t @ Pp @ Z_t.T + H_t
        chol = jnp.linalg.cholesky(S)
        w = jax.scipy.linalg.cho_solve((chol, True), v)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * (nobs * _LOG2PI + logdet + v @ w)

    n_obs_t = jnp.sum(maskf, axis=1)
    ll_t = jax.vmap(loglik_t)(y_c, Z_eff, H_eff, pred_mean, pred_cov, n_obs_t)

    from .kalman import KalmanFilterResult

    return KalmanFilterResult(
        loglik=jnp.sum(ll_t),
        loglik_t=ll_t,
        filtered_mean=filtered_mean,
        filtered_cov=filtered_cov,
        predicted_mean=pred_mean,
        predicted_cov=pred_cov,
    )


def parallel_kalman_loglik(y, T, R, Q, Z, H, d=None, x0=None, P0=None):
    """Total log-likelihood via the associative-scan (parallel-prefix)
    Kalman filter; -inf on non-finite (rejected) draws."""
    ll = parallel_kalman_filter(y, T, R, Q, Z, H, d, x0, P0).loglik
    return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
