"""DSGE-VAR (Del Negro & Schorfheide 2004): VARs with priors from the model.

No counterpart in the reference gEconpy (beyond parity; Dynare's
``dsge_var``).  The DSGE's population moments generate ``lambda * T``
dummy observations for a VAR(p) in the observables; the posterior is
matrix-normal-inverse-Wishart in closed form, and the marginal likelihood
as a function of lambda measures how much the data want to deviate from
the model's cross-equation restrictions:

- lambda -> infinity: the VAR collapses onto the DSGE-implied VAR(p)
  approximation;
- small lambda: an (almost) unrestricted VAR.
- the profile ``log p(Y | theta, lambda)`` peaking at large lambda is
  evidence the DSGE restrictions fit; a peak at small lambda flags
  misspecification.

All linear algebra is jitted device work (slogdet + solves + the
multivariate log-gamma); the DSGE-implied second moments come from the
doubling Lyapunov solve on the state-space solution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .covariance import autocovariance

__all__ = ["dsge_var_moments", "dsge_var_marginal_likelihood",
           "dsge_var_lambda_profile", "niw_log_marginal"]


def _multigammaln(a, d: int):
    from jax.scipy.special import gammaln

    j = jnp.arange(1, d + 1, dtype=jnp.result_type(float))
    return (d * (d - 1) / 4.0) * jnp.log(jnp.pi) \
        + jnp.sum(gammaln(a - (j - 1) / 2.0))


def niw_log_marginal(Gxx, Gxy, Gyy, XtX, XtY, YtY, T: int, lam: float):
    """Log marginal likelihood of T VAR observations under the
    dummy-observation prior (lam * T artificial observations with second
    moments Gxx/Gxy/Gyy).

    Matrix-normal-inverse-Wishart conjugacy:
    ``ln p(Y) = -nT/2 ln pi + n/2 (ln|P0| - ln|P1|)
    + nu0/2 ln|S0| - nu1/2 ln|S1| + ln Gamma_n(nu1/2) - ln Gamma_n(nu0/2)``
    with P0 = lam T Gxx, S0 = lam T (Gyy - Gyx Gxx^{-1} Gxy),
    nu0 = lam T - k, P1 = P0 + X'X, nu1 = nu0 + T.

    Requires ``lam * T > k + n - 1`` for a proper prior.
    """
    n = Gyy.shape[0]
    k = Gxx.shape[0]
    lt = lam * T
    nu0 = lt - k
    nu1 = nu0 + T

    P0 = lt * Gxx
    S0 = lt * (Gyy - Gxy.T @ jnp.linalg.solve(Gxx, Gxy))
    P1 = P0 + XtX
    A = lt * Gxy + XtY                       # P1 @ Phi1
    S1 = lt * Gyy + YtY - A.T @ jnp.linalg.solve(P1, A)

    _, ld_P0 = jnp.linalg.slogdet(P0)
    _, ld_P1 = jnp.linalg.slogdet(P1)
    _, ld_S0 = jnp.linalg.slogdet(S0)
    _, ld_S1 = jnp.linalg.slogdet(S1)
    return (-0.5 * n * T * jnp.log(jnp.pi)
            + 0.5 * n * (ld_P0 - ld_P1)
            + 0.5 * nu0 * ld_S0 - 0.5 * nu1 * ld_S1
            + _multigammaln(nu1 / 2.0, n) - _multigammaln(nu0 / 2.0, n))


def dsge_var_moments(sol: dict, p: int):
    """DSGE-implied VAR(p) second-moment matrices for the observables.

    ``sol`` is a solution dict from ``DSGEStateSpace.build_solution_fn
    (full_state=True)``: T_aug/R_aug/Q/Z/H/d.  Regressor order:
    ``[y_{t-1}, ..., y_{t-p}, 1]``.  Returns (Gxx, Gxy, Gyy) of
    *non-central* moments (means included, intercept row/col appended).
    """
    T, R = sol["T_aug"], sol["R_aug"]
    Q, Z, H, d = sol["Q"], sol["Z"], sol["H"], sol["d"]
    n = Z.shape[0]

    gam = autocovariance(T, R, Q, n_lags=p + 1)          # (p+1, nx, nx)
    A = jnp.einsum("ij,hjk,lk->hil", Z, gam, Z)          # Z T^h Sig Z'
    A = A.at[0].add(H)                                   # ME enters lag 0
    mu = d
    mm = jnp.outer(mu, mu)

    # Gxx: (n p + 1) square; block (i, j) = E[y_{t-i} y_{t-j}']
    def block(i, j):
        dlag = j - i
        return (A[dlag] if dlag >= 0 else A[-dlag].T) + mm

    k = n * p + 1
    Gxx = jnp.zeros((k, k), A.dtype)
    for i in range(1, p + 1):
        for j in range(1, p + 1):
            Gxx = Gxx.at[(i - 1) * n:i * n, (j - 1) * n:j * n].set(
                block(i, j))
        Gxx = Gxx.at[(i - 1) * n:i * n, -1].set(mu)
        Gxx = Gxx.at[-1, (i - 1) * n:i * n].set(mu)
    Gxx = Gxx.at[-1, -1].set(1.0)

    # Gxy: rows i = E[y_{t-i} y_t'] = A(i)' + mm; intercept row = mu'
    Gxy = jnp.concatenate(
        [jnp.concatenate([A[i].T + mm for i in range(1, p + 1)], axis=0),
         mu[None, :]], axis=0)
    Gyy = A[0] + mm
    return Gxx, Gxy, Gyy


def _stack_var_data(data: np.ndarray, p: int):
    y = np.asarray(data, dtype=float)
    if np.isnan(y).any():
        raise ValueError("DSGE-VAR requires fully observed data")
    T_all, n = y.shape
    Y = y[p:]
    X = np.concatenate(
        [y[p - i:T_all - i] for i in range(1, p + 1)]
        + [np.ones((T_all - p, 1))], axis=1)
    return X, Y


def dsge_var_marginal_likelihood(ss_mod, data: np.ndarray, lam: float,
                                 p: int = 4, u=None) -> float:
    """``ln p(Y | theta, lambda)`` for the VAR(p) with the DSGE prior.

    ``u``: unconstrained parameter vector (defaults to the prior
    mean/initial calibration, ``ss_mod.initial_position()``).
    """
    X, Y = _stack_var_data(data, p)
    T_eff, n = Y.shape
    k = X.shape[1]
    if lam * T_eff <= k + n - 1:
        raise ValueError(
            f"lambda too small for a proper prior: need lambda * {T_eff} > "
            f"{k + n - 1}, got {lam * T_eff:.1f}")
    if u is None:
        u = ss_mod.initial_position()
    sol = jax.jit(ss_mod.build_solution_fn(full_state=True))(jnp.asarray(u))
    if not bool(sol["ss_success"] & sol["solver_success"]):
        raise RuntimeError("DSGE solution failed at the supplied parameters")
    Gxx, Gxy, Gyy = dsge_var_moments(sol, p)
    out = jax.jit(niw_log_marginal, static_argnames="T")(
        Gxx, Gxy, Gyy,
        jnp.asarray(X.T @ X, Gxx.dtype), jnp.asarray(X.T @ Y, Gxx.dtype),
        jnp.asarray(Y.T @ Y, Gxx.dtype), T=T_eff, lam=float(lam))
    return float(out)


def dsge_var_lambda_profile(ss_mod, data: np.ndarray, p: int = 4,
                            lambdas=None, u=None) -> pd.DataFrame:
    """The DS misspecification profile: log marginal likelihood over a
    lambda grid (plus the minimum proper lambda).  The argmax is the
    data-preferred weight on the DSGE restrictions."""
    X, Y = _stack_var_data(data, p)
    T_eff, n = Y.shape
    k = X.shape[1]
    lam_min = (k + n - 1) / T_eff
    if lambdas is None:
        lambdas = np.unique(np.round(
            np.concatenate([np.linspace(1.05 * lam_min, 1.0, 6),
                            np.array([1.5, 2.0, 5.0, 10.0, 100.0])]), 4))
    rows = []
    for lam in lambdas:
        if lam * T_eff <= k + n - 1:
            continue
        rows.append((float(lam), dsge_var_marginal_likelihood(
            ss_mod, data, lam, p=p, u=u)))
    out = pd.DataFrame(rows, columns=["lambda", "log_ml"]).set_index("lambda")
    out.attrs["lambda_min"] = lam_min
    return out
