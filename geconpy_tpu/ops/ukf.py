"""Unscented Kalman filter for nonlinear (second-order) state spaces.

The reference (gEconpy) estimates first-order solutions only, via the linear
Kalman filter (``gEconpy/model/statespace.py:1139`` -> pymc_extras).  This
module extends likelihood-based estimation to the pruned second-order state
space (``models/second_order.py``), TPU-first:

- **Augmented-state sigma points.**  Each step draws 2(n+q)+1 sigma points
  over the joint (state, shock) vector, so nonlinear shock entry
  (the G_xu / G_uu terms of the pruned system) is handled exactly to second
  order — no additive-noise approximation.
- **Block-diagonal square root.**  cov(state, shock) is block diagonal, so
  the matrix square root is chol(P) (+) chol(Q) — never factor the (n+q)
  augmented matrix.
- **Fully differentiable.**  Every operation is smooth (cholesky, matmuls,
  where-masks), so ``jax.grad`` flows through the whole filter and NUTS can
  sample second-order posteriors.  The scan is vmappable over draws/chains.
- **Masked missing data** with the same neutralized-row scheme as
  ``ops/kalman.py`` (unit variance on missing rows, loglik counts observed
  entries only), keeping ragged data static-shaped.
- **Failure = flags.**  Indefinite covariances produce NaN through cholesky;
  the final ``success`` flag ANDs per-step finiteness.  No exceptions on
  device (vmap-batched MCMC draws must not abort the batch).

The scaled unscented transform (Julier-Uhlmann / van der Merwe) is exact for
linear dynamics regardless of (alpha, beta, kappa): with f linear the sigma
mean/covariance reproduce the Kalman predict/update identically, which is the
oracle test in ``tests/ops/test_ukf.py``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["UKFResult", "UKFSmootherResult", "CLUKFResult",
           "ukf_loglik", "ukf_smoother", "cl_ukf_loglik"]

_LOG2PI = 1.8378770664093453


class UKFResult(NamedTuple):
    loglik: jax.Array          # scalar total log-likelihood
    loglik_t: jax.Array        # (periods,) per-period contributions
    filtered_mean: jax.Array   # (periods, n)
    filtered_cov: jax.Array    # (periods, n, n)
    success: jax.Array         # scalar bool: all steps finite & PSD


class UKFSmootherResult(NamedTuple):
    smoothed_mean: jax.Array   # (periods, n) E[x_t | y_{1:T}]
    smoothed_cov: jax.Array    # (periods, n, n)
    filtered_mean: jax.Array
    filtered_cov: jax.Array
    loglik: jax.Array
    success: jax.Array


def _sigma_weights(L: int, alpha: float, beta: float, kappa: float, dtype):
    lam = alpha * alpha * (L + kappa) - L
    c = L + lam
    wm = jnp.full((2 * L + 1,), 1.0 / (2.0 * c), dtype)
    wm = wm.at[0].set(lam / c)
    wc = wm.at[0].set(lam / c + (1.0 - alpha * alpha + beta))
    return wm, wc, jnp.asarray(jnp.sqrt(c), dtype)


@highest_precision
def _ukf_forward(y, transition: Callable, observe: Callable, Q, H,
                 x0, P0, alpha: float = 1.0, beta: float = 2.0,
                 kappa: float = 0.0, jitter: float = 0.0,
                 remat: bool = False):
    """Unscented filter forward pass (shared by ukf_loglik / ukf_smoother).

    Parameters
    ----------
    y
        (periods, k_obs) data, NaN = missing.
    transition
        ``transition(x, eps) -> x_next`` — nonlinear state recursion with
        the shock vector entering arbitrarily (eps ~ N(0, Q)).
    observe
        ``observe(x) -> (k_obs,)`` predicted observation; measurement noise
        is additive with covariance ``H``.
    Q, H
        shock / measurement-noise covariances.
    x0, P0
        prior state mean and covariance at t=0 (before the first predict).
    jitter
        extra diagonal added to the state covariance before each
        factorization, on top of an automatic dtype-aware floor of
        ``100 * eps * max(diag, 1)`` (singular-but-PSD covariances are
        legitimate — e.g. the y2 block of an exactly log-linear model is
        identically zero — and plain cholesky would NaN on them).

    Returns ``UKFResult``; ``success`` is False when any covariance
    factorization failed (non-PSD -> NaN) or a non-finite value appeared.
    """
    y = jnp.asarray(y)
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    Q = jnp.asarray(Q, dtype)
    H = jnp.asarray(H, dtype)
    P0 = jnp.asarray(P0, dtype)
    n = x0.shape[0]
    q = Q.shape[0]
    k = H.shape[0]
    L = n + q
    wm, wc, gamma = _sigma_weights(L, alpha, beta, kappa, dtype)
    eye_n = jnp.eye(n, dtype=dtype)
    eps100 = 100.0 * jnp.finfo(dtype).eps

    def _safe_chol(P, eye):
        # PSD floor: semidefinite covariances (exact zeros on the diagonal)
        # are valid inputs; cholesky needs strict positivity
        scale = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(P))), 1.0)
        return jnp.linalg.cholesky(P + eye * (jitter + eps100 * scale))

    chol_Q = _safe_chol(Q, jnp.eye(q, dtype=dtype))

    v_trans = jax.vmap(transition)
    v_obs = jax.vmap(observe)

    def step(carry, y_t):
        x, P = carry
        # --- sigma points over the augmented (x, eps) vector; its covariance
        # is block diagonal, so the augmented square root is chol(P) (+)
        # chol(Q) and the +/- column perturbations touch either the state
        # part (shock = 0) or the shock part (state = x), never both.
        # Point order [center, +dx(n), -dx(n), +de(q), -de(q)] is a
        # permutation of the canonical [center, +cols(L), -cols(L)]; all
        # non-center weights are equal so the permutation is free.
        chol_P = _safe_chol(0.5 * (P + P.T), eye_n)     # (n, n)
        dx = gamma * chol_P.T                           # (n, n) rows = points
        de = gamma * chol_Q.T                           # (q, q)
        xs = jnp.concatenate([
            x[None, :],
            x[None, :] + dx, x[None, :] - dx,
            jnp.broadcast_to(x, (2 * q, n)),
        ], axis=0)                                      # (2L+1, n)
        es = jnp.concatenate([
            jnp.zeros((1 + 2 * n, q), dtype),
            de, -de,
        ], axis=0)                                      # (2L+1, q)

        # --- propagate
        xp = v_trans(xs, es)                            # (2L+1, n)
        x_pred = wm @ xp
        dxp = xp - x_pred[None, :]
        P_pred = jnp.einsum("s,si,sj->ij", wc, dxp, dxp)
        P_pred = 0.5 * (P_pred + P_pred.T)

        # --- re-draw sigma points at the predicted density for the update
        # (avoids third-order bias from reusing propagated points).
        # The PSD floor is committed INTO P_pred (not just the factor):
        # the update subtracts K S K^T where S inherits the sigma spread,
        # so inflating the factor but not P_pred would push P_filt negative
        # by exactly the floor along perfectly-observed directions (H = 0).
        scale_p = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(P_pred))), 1.0)
        P_pred = P_pred + eye_n * (jitter + eps100 * scale_p)
        chol_Pp = jnp.linalg.cholesky(P_pred)
        dxu = gamma * chol_Pp
        xu = jnp.concatenate([
            x_pred[None, :],
            x_pred[None, :] + dxu.T, x_pred[None, :] - dxu.T,
        ], axis=0)                                      # (2n+1, n)
        # weights for the n-dim update set, reusing the same spread gamma:
        # points sit at +/- gamma * chol cols, so matching c_u = gamma^2
        # makes the transform reproduce P_pred exactly (and stay exact for
        # linear observe()).
        cu = gamma ** 2
        lam_u = cu - n
        wmu = jnp.full((2 * n + 1,), 1.0 / (2.0 * cu), dtype)
        wmu = wmu.at[0].set(lam_u / cu)
        wcu = wmu.at[0].set(lam_u / cu + (1.0 - alpha * alpha + beta))

        yp = v_obs(xu)                                  # (2n+1, k)
        # --- masked update
        mask = jnp.isfinite(y_t)
        maskf = mask.astype(dtype)
        y_eff = jnp.where(mask, y_t, 0.0)
        yp_eff = yp * maskf[None, :]
        y_hat = wmu @ yp_eff
        dy = yp_eff - y_hat[None, :]
        dxu_pts = xu - x_pred[None, :]
        S = jnp.einsum("s,si,sj->ij", wcu, dy, dy) \
            + H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)
        Pxy = jnp.einsum("s,si,sj->ij", wcu, dxu_pts, dy)

        v = y_eff - y_hat
        chol_S = jnp.linalg.cholesky(S)
        w = jax.scipy.linalg.cho_solve((chol_S, True), v)
        K = jax.scipy.linalg.cho_solve((chol_S, True), Pxy.T).T

        x_filt = x_pred + K @ v
        P_filt = P_pred - K @ S @ K.T
        P_filt = 0.5 * (P_filt + P_filt.T)

        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_S)))
        n_obs_t = jnp.sum(maskf)
        ll_t = -0.5 * (n_obs_t * _LOG2PI + logdet + v @ w)

        ok = jnp.isfinite(ll_t) & jnp.all(jnp.isfinite(x_filt))
        # freeze on failure so subsequent steps stay finite for the flag
        x_next = jnp.where(ok, x_filt, x)
        P_next = jnp.where(ok, P_filt, P)
        # cross-covariance Cov(x_{t-1}^filt, x_t^pred) for the RTS smoother
        cross = jnp.einsum("s,si,sj->ij", wc, xs - x[None, :], dxp)
        return ((x_next, P_next),
                (ll_t, x_filt, P_filt, x_pred, P_pred, cross, ok))

    body = jax.checkpoint(step, prevent_cse=False) if remat else step
    (_, _), (ll_t, means, covs, preds, pred_covs, crosses, oks) = \
        jax.lax.scan(body, (x0, P0), y)
    success = jnp.all(oks)
    return (UKFResult(jnp.sum(ll_t), ll_t, means, covs, success),
            (preds, pred_covs, crosses))


def ukf_loglik(y, transition: Callable, observe: Callable, Q, H,
               x0, P0, alpha: float = 1.0, beta: float = 2.0,
               kappa: float = 0.0, jitter: float = 0.0,
               remat: bool = False) -> UKFResult:
    """Unscented filter log-likelihood — see :func:`_ukf_forward` for the
    full parameter documentation.  Returns :class:`UKFResult`; ``success``
    is False when any covariance factorization failed or a non-finite value
    appeared.  ``remat=True`` recomputes filter steps in the backward pass
    (HBM-bound batched gradients)."""
    res, _ = _ukf_forward(y, transition, observe, Q, H, x0, P0,
                          alpha, beta, kappa, jitter, remat)
    return res


@highest_precision
def ukf_smoother(y, transition: Callable, observe: Callable, Q, H,
                 x0, P0, alpha: float = 1.0, beta: float = 2.0,
                 kappa: float = 0.0, jitter: float = 0.0
                 ) -> UKFSmootherResult:
    """Unscented RTS smoother: E[x_t | y_{1:T}] for the nonlinear state
    space (same conventions as :func:`ukf_loglik`).

    Backward recursion with the sigma-point cross-covariance
    C_t = Cov(x_t^filt, x_{t+1}^pred):  G_t = C_t P_pred(t+1)^{-1},
    x_s(t) = x_f(t) + G_t (x_s(t+1) - x_pred(t+1)).  Exact RTS on linear
    models (oracle-tested against ops/kalman.py::kalman_smoother)."""
    res, (preds, pred_covs, crosses) = _ukf_forward(
        y, transition, observe, Q, H, x0, P0, alpha, beta, kappa, jitter)
    means, covs = res.filtered_mean, res.filtered_cov

    def back(carry, inp):
        x_s, P_s = carry
        x_f, P_f, x_p_next, P_p_next, cross = inp
        G = jnp.linalg.solve(P_p_next.T, cross.T).T
        x_new = x_f + G @ (x_s - x_p_next)
        P_new = P_f + G @ (P_s - P_p_next) @ G.T
        P_new = 0.5 * (P_new + P_new.T)
        return (x_new, P_new), (x_new, P_new)

    # crosses[t] couples x_{t-1}^filt with x_t^pred, so shift by one:
    # smoothing step t uses (x_f(t), P_f(t), x_pred(t+1), P_pred(t+1),
    # cross(t+1)) for t = T-2 .. 0
    init = (means[-1], covs[-1])
    inputs = (means[:-1], covs[:-1], preds[1:], pred_covs[1:], crosses[1:])
    _, (xs_rev, Ps_rev) = jax.lax.scan(back, init, inputs, reverse=True)
    sm = jnp.concatenate([xs_rev, means[-1][None, :]], axis=0)
    sc = jnp.concatenate([Ps_rev, covs[-1][None, :, :]], axis=0)
    ok = res.success & jnp.all(jnp.isfinite(sm))
    return UKFSmootherResult(sm, sc, means, covs, res.loglik, ok)


class CLUKFResult(NamedTuple):
    loglik: jax.Array
    loglik_t: jax.Array
    filtered_mean: jax.Array
    filtered_cov: jax.Array
    success: jax.Array


@highest_precision
def cl_ukf_loglik(y, A, nonlinear: Callable, Z, H, d, Q, x0, P0,
                  n_nl: int, alpha: float = 1.0, beta: float = 2.0,
                  kappa: float = 0.0, jitter: float = 0.0,
                  remat: bool = False) -> CLUKFResult:
    """Marginalized (Rao-Blackwellized) unscented filter for conditionally
    linear dynamics with a linear observation:

        z' = A z + b(z[:n_nl], eps),    y = Z z + d + eta

    Only the leading ``n_nl`` state components and the shock enter
    nonlinearly, so sigma points are drawn over that (n_nl + q)-dim
    marginal; the conditional remainder propagates exactly through A
    (E[(z - E[z|z_n]) g(z_n, eps)] = 0 under joint Gaussianity), and the
    update is an exact masked Kalman step — no observation sigma points, no
    second factorization.

    This is the estimation hot path for the pruned second-order DSGE state
    space (``stats/nonlinear.py``): z = (y1, y2, lags), n_nl = n_vars, and
    b = (R eps, quadratic correction, 0).  At SW-2007 scale this halves the
    sigma-point count of the generic :func:`ukf_loglik` (2(n+q)+1 vs
    2(2n+q)+1 with L = 0) while remaining exact for the model class —
    parity asserted against the generic filter in
    tests/stats/test_second_order_estimation.py
    (test_marginalized_matches_full_ukf).
    """
    y = jnp.asarray(y)
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    A = jnp.asarray(A, dtype)
    Q = jnp.asarray(Q, dtype)
    Z = jnp.asarray(Z, dtype)
    H = jnp.asarray(H, dtype)
    d = jnp.zeros((Z.shape[0],), dtype) if d is None else jnp.asarray(d, dtype)
    P0 = jnp.asarray(P0, dtype)
    nz = x0.shape[0]
    q = Q.shape[0]
    L = n_nl + q
    wm, wc, gamma = _sigma_weights(L, alpha, beta, kappa, dtype)
    eps100 = 100.0 * jnp.finfo(dtype).eps
    eye_nl = jnp.eye(n_nl, dtype=dtype)
    eye_nz = jnp.eye(nz, dtype=dtype)
    scale_q = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(Q))), 1.0)
    chol_Q = jnp.linalg.cholesky(Q + jnp.eye(q, dtype=dtype)
                                 * (jitter + eps100 * scale_q))
    v_nl = jax.vmap(nonlinear)

    def step(carry, y_t):
        x, P = carry
        P = 0.5 * (P + P.T)
        P_nn = P[:n_nl, :n_nl]
        scale_n = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(P_nn))), 1.0)
        shift_n = jitter + eps100 * scale_n
        chol_nn = jnp.linalg.cholesky(P_nn + eye_nl * shift_n)
        # conditional slope of the full state on the nonlinear block
        # (leading rows = identity by construction)
        G = jax.scipy.linalg.cho_solve(
            (chol_nn, True), P[:n_nl, :]).T                  # (nz, n_nl)
        # sigma offsets over (z_n, eps); z_l rides the conditional mean
        dn = gamma * chol_nn.T                               # (n_nl, n_nl)
        de = gamma * chol_Q.T                                # (q, q)
        deltas = jnp.concatenate([
            jnp.zeros((1, n_nl), dtype), dn, -dn,
            jnp.zeros((2 * q, n_nl), dtype)], axis=0)        # (2L+1, n_nl)
        es = jnp.concatenate([
            jnp.zeros((1 + 2 * n_nl, q), dtype), de, -de], axis=0)
        zs = x[None, :] + deltas @ G.T                       # (2L+1, nz)
        fs = zs @ A.T + v_nl(zs[:, :n_nl], es)               # (2L+1, nz)

        x_pred = wm @ fs
        df = fs - x_pred[None, :]
        # conditional remainder: exact linear propagation
        Sig_c = P - G @ P_nn @ G.T
        P_pred = jnp.einsum("s,si,sj->ij", wc, df, df) + A @ Sig_c @ A.T
        P_pred = 0.5 * (P_pred + P_pred.T)
        scale_p = jnp.maximum(jnp.max(jnp.abs(jnp.diagonal(P_pred))), 1.0)
        P_pred = P_pred + eye_nz * (jitter + eps100 * scale_p)

        # exact masked Kalman update (observation is linear)
        mask = jnp.isfinite(y_t)
        maskf = mask.astype(dtype)
        y_eff = jnp.where(mask, y_t, 0.0)
        Z_eff = Z * maskf[:, None]
        v = y_eff - Z_eff @ x_pred - d * maskf
        PZt = P_pred @ Z_eff.T
        S = Z_eff @ PZt + H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)
        chol_S = jnp.linalg.cholesky(S)
        w = jax.scipy.linalg.cho_solve((chol_S, True), v)
        K = jax.scipy.linalg.cho_solve((chol_S, True), PZt.T).T
        x_filt = x_pred + K @ v
        IKZ = eye_nz - K @ Z_eff
        H_eff = H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)
        P_filt = IKZ @ P_pred @ IKZ.T + K @ H_eff @ K.T     # Joseph form
        P_filt = 0.5 * (P_filt + P_filt.T)

        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_S)))
        ll_t = -0.5 * (jnp.sum(maskf) * _LOG2PI + logdet + v @ w)
        ok = jnp.isfinite(ll_t) & jnp.all(jnp.isfinite(x_filt))
        x_next = jnp.where(ok, x_filt, x)
        P_next = jnp.where(ok, P_filt, P)
        return (x_next, P_next), (ll_t, x_filt, P_filt, ok)

    # remat: recompute the step in the backward pass instead of storing the
    # per-step sigma/factorization intermediates — at batch 512 on a 16GB
    # chip the stored residuals of a 200-step filter otherwise exceed HBM
    # (measured: 17.6G needed); recompute costs ~2x step flops.
    body = jax.checkpoint(step, prevent_cse=False) if remat else step
    (_, _), (ll_t, means, covs, oks) = jax.lax.scan(body, (x0, P0), y)
    return CLUKFResult(jnp.sum(ll_t), ll_t, means, covs, jnp.all(oks))
