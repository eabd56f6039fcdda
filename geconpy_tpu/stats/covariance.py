"""Unconditional moments of the solved model.

Role parity with ``gEconpy/model/statistics/covariance.py`` (build_Q_matrix:20,
stationary_covariance_matrix:68, autocovariance_matrix:164) — on device via
the doubling Lyapunov solver and a ``lax.scan`` over autocovariance lags, plus
a forecast-error variance decomposition (FEVD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops.lyapunov import solve_discrete_lyapunov

__all__ = [
    "build_shock_cov",
    "build_Q_matrix",
    "stationary_covariance",
    "autocovariance",
    "autocorrelation",
    "fevd",
    "stationary_covariance_matrix",
    "autocovariance_matrix",
    "autocorrelation_matrix",
]


def build_shock_cov(n_shocks: int, shock_std=None, shock_cov=None,
                    dtype=jnp.float64):
    """Assemble the shock covariance Q from stds / full covariance."""
    if shock_cov is not None:
        return jnp.asarray(shock_cov, dtype=dtype)
    if shock_std is None:
        stds = jnp.full((n_shocks,), 0.01, dtype=dtype)
    else:
        stds = jnp.broadcast_to(jnp.asarray(shock_std, dtype=dtype), (n_shocks,))
    return jnp.diag(stds**2)


def build_Q_matrix(model_shocks, shock_std_dict=None, shock_cov_matrix=None,
                   shock_std=None) -> np.ndarray:
    """Reconcile the user-facing shock-variance options into one Q matrix.

    Reference-compatible facade (``gEconpy/model/statistics/covariance.py:20``)
    over :func:`build_shock_cov`: ``model_shocks`` is a list of shock names
    (or symbols with ``base_name``), and exactly one (or zero) of
    ``shock_std_dict`` / ``shock_cov_matrix`` / ``shock_std`` may be given.
    Unnamed shocks under ``shock_std_dict`` get zero variance, as in the
    reference.  With no option at all, Q = I.
    """
    names = [getattr(s, "base_name", str(s)) for s in model_shocks]
    k = len(names)
    given = [x is not None for x in (shock_std_dict, shock_cov_matrix, shock_std)]
    if sum(given) > 1:
        raise ValueError("specify at most one of shock_std_dict, "
                         "shock_cov_matrix, shock_std")
    if shock_cov_matrix is not None:
        Q = np.asarray(shock_cov_matrix, dtype=float)
        if Q.shape != (k, k):
            raise ValueError(f"shock_cov_matrix must be ({k}, {k}), "
                             f"got {Q.shape}")
        return Q
    if shock_std_dict is not None:
        unknown = set(shock_std_dict) - set(names)
        if unknown:
            raise ValueError(f"shock_std_dict names not in the model: "
                             f"{sorted(unknown)}")
        stds = np.zeros(k)
        for name, sd in shock_std_dict.items():
            stds[names.index(name)] = float(sd)
        return np.diag(stds**2)
    if shock_std is not None:
        stds = np.broadcast_to(np.asarray(shock_std, dtype=float), (k,))
        return np.diag(stds**2)
    return np.eye(k)


def stationary_covariance(T, R, Q):
    """Sigma solving  Sigma = T Sigma Tᵀ + R Q Rᵀ  (doubling, on device)."""
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    Q = jnp.asarray(Q, dtype=T.dtype)
    return solve_discrete_lyapunov(T, R @ Q @ R.T)


def autocovariance(T, R, Q, n_lags: int = 10):
    """Gamma_k = T^k Sigma for k = 0..n_lags-1, as one scan."""
    Sigma = stationary_covariance(T, R, Q)
    T = jnp.asarray(T)

    def step(G, _):
        G_next = T @ G
        return G_next, G

    _, gammas = jax.lax.scan(step, Sigma, None, length=n_lags)
    return gammas  # (n_lags, n, n); gammas[0] = Sigma


def autocorrelation(T, R, Q, n_lags: int = 10):
    """Gamma_k normalized by the stationary standard deviations."""
    gammas = autocovariance(T, R, Q, n_lags)
    sd = jnp.sqrt(jnp.clip(jnp.diagonal(gammas[0]), 1e-300))
    return gammas / (sd[:, None] * sd[None, :])


def fevd(T, R, Q, horizon: int = 40):
    """Forecast-error variance decomposition.

    Share of the h-step-ahead forecast-error variance of each variable
    attributable to each orthogonalized shock (Cholesky of Q).
    Returns (horizon, n_variables, n_shocks), rows normalized to 1.
    """
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    Q = jnp.asarray(Q, dtype=T.dtype)
    chol = jnp.linalg.cholesky(Q)
    impact = R @ chol                       # (n, k) orthogonalized impacts

    def step(carry, _):
        Phi, acc = carry                     # Phi = T^h, acc = per-shock cumvar
        contrib = Phi @ impact               # (n, k)
        acc = acc + contrib**2
        return (T @ Phi, acc), acc

    n, k = impact.shape
    init = (jnp.eye(n, dtype=T.dtype), jnp.zeros((n, k), T.dtype))
    _, shares = jax.lax.scan(step, init, None, length=horizon)
    total = jnp.sum(shares, axis=-1, keepdims=True)
    return shares / jnp.clip(total, 1e-300)


# ---- labeled host wrappers ---------------------------------------------------

def stationary_covariance_matrix(solution, shock_std=None, shock_cov=None
                                 ) -> pd.DataFrame:
    """Variable-labeled stationary covariance of a solved model."""
    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    Q = build_shock_cov(R.shape[1], shock_std, shock_cov,
                        dtype=jnp.asarray(T).dtype)
    Sigma = np.asarray(jax.jit(stationary_covariance)(T, R, Q))
    return pd.DataFrame(Sigma, index=solution.T.columns, columns=solution.T.columns)


def autocovariance_matrix(solution, n_lags: int = 10, shock_std=None,
                          shock_cov=None, correlation: bool = True) -> pd.DataFrame:
    """(lag, variable)-labeled autocovariance/autocorrelation table Gamma_k."""
    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    Q = build_shock_cov(R.shape[1], shock_std, shock_cov,
                        dtype=jnp.asarray(T).dtype)
    fn = autocorrelation if correlation else autocovariance
    arr = np.asarray(jax.jit(lambda t, r, q: fn(t, r, q, n_lags))(T, R, Q))
    index = pd.MultiIndex.from_product(
        [range(n_lags), solution.T.columns], names=["lag", "variable"])
    return pd.DataFrame(arr.reshape(-1, arr.shape[-1]), index=index,
                        columns=solution.T.columns)


def autocorrelation_matrix(solution, n_lags: int = 10, shock_std=None,
                           shock_cov=None) -> pd.DataFrame:
    """Labeled autocorrelation matrices Gamma_k / (sd sdᵀ), k = 0..n_lags-1
    (reference name: ``gEconpy.autocorrelation_matrix``)."""
    return autocovariance_matrix(solution, n_lags=n_lags, shock_std=shock_std,
                                 shock_cov=shock_cov, correlation=True)
