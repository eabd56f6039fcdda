"""Method-of-moments estimation (GMM on analytic state-space moments).

Dynare's ``method_of_moments`` role (no counterpart in the reference
gEconpy): match model-implied first and second moments of the observables
— means, (co)variances, autocovariances — to their sample counterparts
under a weighted quadratic distance.

TPU-first mechanics: the model moments are *analytic* functions of the
state-space solution (doubling Lyapunov + matrix powers, no simulation),
so the whole objective ``theta -> moments`` is one differentiable jitted
program and the estimator is Adam + Gauss-Newton on exact gradients —
simulated method of moments without the simulation noise.  Standard
errors use the GMM sandwich with a Newey-West long-run variance of the
sample moment conditions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ._optim import adam_gauss_newton
from .covariance import autocovariance

__all__ = ["MomentMatchResult", "fit_moment_matching", "model_moments"]


class MomentMatchResult(NamedTuple):
    params: dict               # point estimates (constrained)
    std_errors: dict           # GMM sandwich SEs
    loss: float                # weighted distance at the optimum
    moments: pd.DataFrame      # model vs sample for every matched moment
    success: bool
    n_moments: int


def _moment_labels(obs_names, lags):
    labels = [("mean", v, 0) for v in obs_names]
    n = len(obs_names)
    for i in range(n):
        for jj in range(i, n):
            labels.append(("cov", f"{obs_names[i]},{obs_names[jj]}", 0))
    for lag in lags:
        for i in range(n):
            for jj in range(n):
                labels.append(
                    ("autocov", f"{obs_names[i]},{obs_names[jj]}", lag))
    return labels


def model_moments(sol: dict, lags: tuple[int, ...]):
    """Stacked analytic moments [means, vech(cov), autocovs(lags)] of the
    observables implied by a solution dict (full_state=True)."""
    T, R = sol["T_aug"], sol["R_aug"]
    Q, Z, H, d = sol["Q"], sol["Z"], sol["H"], sol["d"]
    n = Z.shape[0]
    max_lag = max(lags) if lags else 0
    gam = autocovariance(T, R, Q, n_lags=max_lag + 1)
    A = jnp.einsum("ij,hjk,lk->hil", Z, gam, Z)
    A = A.at[0].add(H)
    iu = jnp.triu_indices(n)
    parts = [d, A[0][iu]]
    for lag in lags:
        parts.append(A[lag].reshape(-1))
    return jnp.concatenate(parts)


def _sample_moment_series(y: np.ndarray, lags: tuple[int, ...]):
    """Per-period moment-condition series h_t (T_eff, n_mom) whose time
    average is the stacked sample moment vector."""
    Tn, n = y.shape
    max_lag = max(lags) if lags else 0
    ybar = y.mean(axis=0)
    yc = y - ybar
    T_eff = Tn - max_lag
    cols = [y[max_lag:]]                                     # means
    iu = np.triu_indices(n)
    prods = yc[max_lag:, :, None] * yc[max_lag:, None, :]    # (T_eff, n, n)
    cols.append(prods[:, iu[0], iu[1]])
    for lag in lags:
        lagged = yc[max_lag:, :, None] * yc[max_lag - lag:Tn - lag, None, :]
        cols.append(lagged.reshape(T_eff, -1))
    return np.concatenate(cols, axis=1)


def _newey_west(h: np.ndarray, n_lags: int | None = None):
    T_eff, _ = h.shape
    hc = h - h.mean(axis=0)
    if n_lags is None:
        n_lags = int(np.floor(4 * (T_eff / 100.0) ** (2.0 / 9.0)))
    S = hc.T @ hc / T_eff
    for lag in range(1, n_lags + 1):
        w = 1.0 - lag / (n_lags + 1.0)
        G = hc[lag:].T @ hc[:-lag] / T_eff
        S = S + w * (G + G.T)
    return S


def fit_moment_matching(
    ss_mod,
    data: np.ndarray,
    lags: tuple[int, ...] = (1,),
    weights: np.ndarray | str = "diag",
    u0=None,
    adam_steps: int = 400,
    newton_steps: int = 6,
    learning_rate: float = 0.02,
) -> MomentMatchResult:
    """Estimate the configured parameters by matching observable moments.

    Matched moments: means, the upper triangle of the contemporaneous
    covariance, and full autocovariance matrices at each lag in ``lags``.
    ``weights``: "diag" (default — inverse Newey-West variances of each
    sample moment, a diagonal approximation to optimal GMM), "identity",
    or an explicit (n_mom,) vector / (n_mom, n_mom) matrix.

    Parameters are the state-space's estimated set (GCN priors define the
    unconstrained search space via their transforms); the prior densities
    are NOT part of the objective — this is frequentist GMM.
    """
    y = np.asarray(data, dtype=float)
    if np.isnan(y).any():
        raise ValueError("moment matching requires fully observed data")
    lags = tuple(int(l) for l in lags)
    if any(l <= 0 for l in lags):
        raise ValueError("lags must be positive (lag 0 is always matched)")
    obs_names = list(ss_mod.observed_states)

    h = _sample_moment_series(y, lags)
    m_data = h.mean(axis=0)
    n_mom = len(m_data)
    S = _newey_west(h)

    if isinstance(weights, str):
        if weights == "identity":
            W_sqrt = np.ones(n_mom)
        elif weights == "diag":
            W_sqrt = 1.0 / np.sqrt(np.clip(np.diag(S), 1e-30, np.inf))
        else:
            raise ValueError("weights must be 'diag', 'identity' or an array")
        W = np.diag(W_sqrt**2)
        sqrtW = jnp.asarray(W_sqrt)

        def apply_sqrtW(r):
            return sqrtW * r
    else:
        W = np.asarray(weights, dtype=float)
        if W.ndim == 1:
            W = np.diag(W)
        Lw = np.linalg.cholesky(W)
        LwT = jnp.asarray(Lw.T)

        def apply_sqrtW(r):
            return LwT @ r

    solve_draw = ss_mod.build_solution_fn(full_state=True)
    m_data_j = jnp.asarray(m_data)

    def residuals(u):
        sol = solve_draw(u)
        ok = sol["ss_success"] & sol["solver_success"] & sol["stable"]
        m = model_moments(sol, lags)
        return apply_sqrtW(m - m_data_j), ok

    u = jnp.asarray(ss_mod.initial_position() if u0 is None else u0)
    u = adam_gauss_newton(residuals, u, adam_steps=adam_steps,
                          newton_steps=newton_steps,
                          learning_rate=learning_rate)
    r_fin, _ = residuals(u)
    final_loss = float(jnp.sum(r_fin * r_fin))
    r, ok = residuals(u)

    # GMM sandwich: G = d m / d theta (constrained); with Wd = W used in
    # the objective, Var = (G'WG)^{-1} G'W S W G (G'WG)^{-1} / T_eff
    theta_hat = np.asarray(ss_mod.constrain(u))

    # chain rule into constrained space: G_theta = G_u @ (d theta/d u)^{-1}
    # (constrain is elementwise, so the Jacobian is diagonal and jittable;
    # unconstrain is host-side and not traceable)
    G_u = np.asarray(jax.jacrev(
        lambda uu: model_moments(solve_draw(uu), lags))(u))
    J_c = np.asarray(jax.jacrev(ss_mod.constrain)(u))
    G = G_u @ np.linalg.inv(J_c)
    T_eff = h.shape[0]
    GW = G.T @ W
    bread = np.linalg.inv(GW @ G + 1e-12 * np.eye(G.shape[1]))
    cov = bread @ (GW @ S @ GW.T) @ bread / T_eff
    se = np.sqrt(np.clip(np.diag(cov), 0, np.inf))

    labels = _moment_labels(obs_names, lags)
    m_model = np.asarray(model_moments(jax.jit(solve_draw)(u), lags))
    moments = pd.DataFrame(
        {"model": m_model, "sample": m_data},
        index=pd.MultiIndex.from_tuples(labels,
                                        names=["kind", "which", "lag"]))

    names = ss_mod.param_labels
    return MomentMatchResult(
        params=dict(zip(names, theta_hat.tolist())),
        std_errors=dict(zip(names, se.tolist())),
        loss=final_loss,
        moments=moments,
        success=bool(ok),
        n_moments=n_mom,
    )
