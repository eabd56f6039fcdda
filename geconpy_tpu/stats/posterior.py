"""Posterior analysis: batched device-side sweeps over MCMC draws.

Role parity with the reference's posterior tooling
(``gEconpy/model/statespace.py``: sample_autocorrelation_matrices:1217,
data_from_prior:1324, prepare_mixed_frequency_data:1432; plus the xarray IRF
post-processing).  Each per-draw quantity (IRF, ACF, smoothed states, FEVD,
diagnostics) is one vmapped device function over the posterior sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops.kalman import kalman_smoother
from ..ops.lyapunov import solve_discrete_lyapunov
from .covariance import autocorrelation as _acf
from .covariance import fevd as _fevd
from .estimation import PosteriorResult
from .statespace import DSGEStateSpace

__all__ = [
    "posterior_irfs",
    "posterior_autocorrelation",
    "posterior_fevd",
    "posterior_smoothed_states",
    "posterior_diagnostics",
    "posterior_predictive",
    "posterior_girfs",
    "historical_shock_decomposition",
    "prepare_mixed_frequency_data",
]


def _flat_draws(result: PosteriorResult, max_draws: int | None, seed: int = 0):
    u = result.unconstrained.reshape(-1, result.unconstrained.shape[-1])
    if max_draws is not None and len(u) > max_draws:
        idx = np.random.default_rng(seed).choice(len(u), max_draws,
                                                 replace=False)
        u = u[idx]
    return jnp.asarray(u)


def posterior_irfs(ss_mod: DSGEStateSpace, result: PosteriorResult,
                   periods: int = 40, max_draws: int | None = 500,
                   quantiles=(0.05, 0.5, 0.95)) -> pd.DataFrame:
    """IRF posterior bands: per-draw solve + scan, vmapped over draws.

    Returns a DataFrame indexed by (shock, variable, time) with one column
    per quantile plus the mean.
    """
    solve_draw = ss_mod.build_solution_fn()
    mf = ss_mod.model.functions
    n_shocks = mf.n_shocks

    def one_draw(u):
        sol = solve_draw(u)
        T, R, Q = sol["T"], sol["R"], sol["Q"]
        sd = jnp.sqrt(jnp.diagonal(Q))

        def one_shock(j_onehot):
            def step(x, _):
                return T @ x, x

            x0 = R @ j_onehot
            _, path = jax.lax.scan(step, x0, None, length=periods)
            return path

        impulses = jnp.eye(n_shocks, dtype=T.dtype) * sd[:, None]
        return jax.vmap(one_shock)(impulses)   # (n_shocks, periods, n)

    us = _flat_draws(result, max_draws)
    irfs = np.asarray(jax.jit(jax.vmap(one_draw))(us))  # (draws, s, t, n)

    index = pd.MultiIndex.from_product(
        [mf.shock_names, mf.variable_names, range(periods)],
        names=["shock", "variable", "time"])
    flat = irfs.transpose(1, 3, 2, 0).reshape(len(index), len(us))
    out = pd.DataFrame(index=index)
    out["mean"] = flat.mean(axis=1)
    for q in quantiles:
        out[f"q{q}"] = np.quantile(flat, q, axis=1)
    return out


def posterior_autocorrelation(ss_mod: DSGEStateSpace, result: PosteriorResult,
                              n_lags: int = 10, max_draws: int | None = 500,
                              quantiles=(0.05, 0.5, 0.95)) -> pd.DataFrame:
    """Posterior ACF bands per variable (diagonal of the ACF matrices)."""
    solve_draw = ss_mod.build_solution_fn()
    mf = ss_mod.model.functions

    def one_draw(u):
        sol = solve_draw(u)
        acf = _acf(sol["T"], sol["R"], sol["Q"], n_lags)
        return jnp.diagonal(acf, axis1=1, axis2=2)   # (n_lags, n)

    us = _flat_draws(result, max_draws)
    acfs = np.asarray(jax.jit(jax.vmap(one_draw))(us))  # (draws, lags, n)
    index = pd.MultiIndex.from_product(
        [range(n_lags), mf.variable_names], names=["lag", "variable"])
    flat = acfs.transpose(1, 2, 0).reshape(len(index), len(us))
    out = pd.DataFrame(index=index)
    out["mean"] = flat.mean(axis=1)
    for q in quantiles:
        out[f"q{q}"] = np.quantile(flat, q, axis=1)
    return out


def posterior_fevd(ss_mod: DSGEStateSpace, result: PosteriorResult,
                   horizon: int = 40, max_draws: int | None = 500
                   ) -> pd.DataFrame:
    """Posterior-mean forecast-error variance decomposition at ``horizon``."""
    solve_draw = ss_mod.build_solution_fn()
    mf = ss_mod.model.functions

    def one_draw(u):
        sol = solve_draw(u)
        return _fevd(sol["T"], sol["R"], sol["Q"], horizon)[-1]   # (n, k)

    us = _flat_draws(result, max_draws)
    shares = np.asarray(jax.jit(jax.vmap(one_draw))(us)).mean(axis=0)
    return pd.DataFrame(shares, index=mf.variable_names,
                        columns=mf.shock_names)


def posterior_smoothed_states(ss_mod: DSGEStateSpace, result: PosteriorResult,
                              data: np.ndarray, max_draws: int | None = 200,
                              quantiles=(0.05, 0.5, 0.95)) -> pd.DataFrame:
    """Smoothed state paths over posterior draws (vmapped RTS smoother)."""
    solve_draw = ss_mod.build_solution_fn(full_state=True)
    mf = ss_mod.model.functions
    y = jnp.asarray(data)
    n = mf.n_variables

    def one_draw(u):
        sol = solve_draw(u)
        sm = kalman_smoother(y, sol["T_aug"], sol["R_aug"], sol["Q"],
                             sol["Z"], sol["H"], d=sol["d"])
        return sm.smoothed_mean[:, :n]   # current block of the lag-augmented state

    us = _flat_draws(result, max_draws)
    paths = np.asarray(jax.jit(jax.vmap(one_draw))(us))  # (draws, t, n)
    index = pd.MultiIndex.from_product(
        [range(paths.shape[1]), mf.variable_names], names=["time", "variable"])
    flat = paths.transpose(1, 2, 0).reshape(len(index), len(us))
    out = pd.DataFrame(index=index)
    out["mean"] = flat.mean(axis=1)
    for q in quantiles:
        out[f"q{q}"] = np.quantile(flat, q, axis=1)
    return out


def historical_shock_decomposition(ss_mod: DSGEStateSpace,
                                   result: PosteriorResult,
                                   data: np.ndarray,
                                   max_draws: int | None = 200) -> pd.DataFrame:
    """Historical decomposition: attribute every smoothed state path to the
    structural shocks driving it.

    Per posterior draw, the Durbin-Koopman disturbance smoother
    (``ops/kalman.py::disturbance_smoother``) extracts smoothed shocks
    ``e_t`` satisfying the exact identity ``x_t^s = T x_{t-1}^s + R e_t^s``;
    replaying the transition with one shock at a time splits the path into
    per-shock contributions plus an initial-condition component that sum
    EXACTLY to the smoothed states.  Averaged over draws.

    Returns a DataFrame indexed by (time, variable) with one column per
    shock, an ``initial`` column, and the ``smoothed`` total.  This is the
    Dynare ``shock_decomposition`` / gEcon-R equivalent; the reference
    (gEconpy) has no counterpart.
    """
    from ..ops.kalman import disturbance_smoother

    solve_draw = ss_mod.build_solution_fn(full_state=True)
    mf = ss_mod.model.functions
    y = jnp.asarray(data)
    n = mf.n_variables
    k_shocks = len(mf.shock_names)

    def one_draw(u):
        sol = solve_draw(u)
        T, R = sol["T_aug"], sol["R_aug"]
        dsm = disturbance_smoother(y, T, R, sol["Q"], sol["Z"], sol["H"],
                                   d=sol["d"])
        eps = dsm.shocks                                  # (periods, k)
        x_s = dsm.smoothed_mean

        def replay(eps_j):
            def step(x, e):
                x_new = T @ x + R @ e
                return x_new, x_new

            _, path = jax.lax.scan(step, jnp.zeros_like(x_s[0]), eps_j)
            return path

        # per-shock contributions: replay with the other shocks zeroed
        eye = jnp.eye(k_shocks, dtype=eps.dtype)
        contribs = jax.vmap(lambda m: replay(eps * m[None, :]))(eye)
        # initial condition: whatever the shocks don't explain
        initial = x_s - contribs.sum(axis=0)
        return contribs[:, :, :n], initial[:, :n], x_s[:, :n]

    us = _flat_draws(result, max_draws)
    contribs, initial, smoothed = jax.jit(jax.vmap(one_draw))(us)
    contribs = np.asarray(contribs).mean(axis=0)          # (k, t, n)
    initial = np.asarray(initial).mean(axis=0)            # (t, n)
    smoothed = np.asarray(smoothed).mean(axis=0)

    periods = smoothed.shape[0]
    index = pd.MultiIndex.from_product(
        [range(periods), mf.variable_names], names=["time", "variable"])
    out = pd.DataFrame(index=index)
    for j, name in enumerate(mf.shock_names):
        out[name] = contribs[j].reshape(-1)
    out["initial"] = initial.reshape(-1)
    out["smoothed"] = smoothed.reshape(-1)
    return out


def posterior_predictive(ss_mod: DSGEStateSpace, result: PosteriorResult,
                         key, periods: int = 100,
                         max_draws: int | None = 200,
                         quantiles=(0.05, 0.5, 0.95)) -> pd.DataFrame:
    """Posterior predictive datasets: simulate the observables at posterior
    draws (one simulated sample per retained draw, fresh shock and
    measurement-noise realizations), returning per-(variable, time)
    quantile bands.  Compare against the estimation data for predictive
    checks — the posterior counterpart of ``data_from_prior``.
    """
    solve_draw = ss_mod.build_solution_fn()
    obs_names = ss_mod.observed_states
    k = len(obs_names)

    def one_draw(u, k_draw):
        sol = solve_draw(u)
        T, R, Q, Z, H, d = (sol["T_aug"], sol["R_aug"], sol["Q"], sol["Z"],
                            sol["H"], sol["d"])
        n = T.shape[0]
        k_eps, k_eta = jax.random.split(k_draw)
        chol_Q = jnp.linalg.cholesky(Q)
        eps = jax.random.normal(k_eps, (periods, Q.shape[0]),
                                T.dtype) @ chol_Q.T
        h_std = jnp.sqrt(jnp.diagonal(H))
        eta = jax.random.normal(k_eta, (periods, k), T.dtype) * h_std

        def step(x, inp):
            e, m = inp
            x_next = T @ x + R @ e
            return x_next, Z @ x_next + d + m

        _, y = jax.lax.scan(step, jnp.zeros((n,), T.dtype), (eps, eta))
        return y

    us = _flat_draws(result, max_draws)
    keys = jax.random.split(jnp.asarray(key), len(us))
    ys = np.asarray(jax.jit(jax.vmap(one_draw))(us, keys))  # (d, t, k)

    index = pd.MultiIndex.from_product(
        [obs_names, range(periods)], names=["variable", "time"])
    flat = ys.transpose(2, 1, 0).reshape(len(index), len(us))
    out = pd.DataFrame(index=index)
    out["mean"] = flat.mean(axis=1)
    for q in quantiles:
        out[f"q{q}"] = np.quantile(flat, q, axis=1)
    return out


def posterior_girfs(ss_mod: DSGEStateSpace, result: PosteriorResult,
                    shock: str, key, shock_size: float | None = None,
                    periods: int = 40, n_mc: int = 128,
                    max_draws: int | None = 100,
                    quantiles=(0.05, 0.5, 0.95)) -> pd.DataFrame:
    """Second-order generalized IRF posterior bands (Koop-Pesaran-Potter
    GIRFs of the pruned system, ``models/second_order.py::generalized_irf``,
    vmapped over posterior draws).  Completes the order-2 posterior story:
    ``fit(order=2)`` -> GIRF bands that reflect both parameter and
    state/shock uncertainty.

    ``shock_size`` defaults to one posterior-draw standard deviation of the
    named shock.
    """
    from ..models.second_order import SecondOrderResult, generalized_irf

    solve_draw = ss_mod.build_second_order_solution_fn()
    mf = ss_mod.model.functions
    j = mf.shock_names.index(shock)
    n_shocks = mf.n_shocks

    def one_draw(u, k_draw):
        sol = solve_draw(u)
        res2 = SecondOrderResult(sol["G_xx"], sol["G_xu"], sol["G_uu"],
                                 sol["g_ss"], sol["so_success"])
        sd = jnp.sqrt(sol["Q"][j, j])
        size = sd if shock_size is None else jnp.asarray(shock_size,
                                                         sol["T"].dtype)
        vec = jnp.zeros((n_shocks,), sol["T"].dtype).at[j].set(size)
        return generalized_irf(sol["T"], sol["R"], res2, vec, sol["Q"],
                               periods=periods, n_draws=n_mc, key=k_draw)

    us = _flat_draws(result, max_draws)
    keys = jax.random.split(jnp.asarray(key), len(us))
    girfs = np.asarray(jax.jit(jax.vmap(one_draw))(us, keys))  # (d, t, n)

    index = pd.MultiIndex.from_product(
        [mf.variable_names, range(periods)], names=["variable", "time"])
    flat = girfs.transpose(2, 1, 0).reshape(len(index), len(us))
    out = pd.DataFrame(index=index)
    out["mean"] = flat.mean(axis=1)
    for q in quantiles:
        out[f"q{q}"] = np.quantile(flat, q, axis=1)
    return out


def posterior_diagnostics(ss_mod: DSGEStateSpace, result: PosteriorResult,
                          max_draws: int | None = 1000) -> pd.DataFrame:
    """Per-draw solver diagnostics over the posterior — the analog of the
    reference's Deterministic trace nodes (deterministic_norm,
    stochastic_norm, bk/solver success)."""
    solve_draw = ss_mod.build_solution_fn()

    def one_draw(u):
        sol = solve_draw(u)
        return (sol["ss_success"], sol["solver_success"], sol["stable"],
                sol["deterministic_norm"], sol["stochastic_norm"],
                sol["spectral_radius"])

    us = _flat_draws(result, max_draws)
    ss_ok, sv_ok, stable, det, stoch, rho = jax.jit(jax.vmap(one_draw))(us)
    return pd.DataFrame({
        "ss_success": np.asarray(ss_ok),
        "solver_success": np.asarray(sv_ok),
        "stable": np.asarray(stable),
        "deterministic_norm": np.asarray(det),
        "stochastic_norm": np.asarray(stoch),
        "spectral_radius": np.asarray(rho),
    })


def prepare_mixed_frequency_data(low_freq: pd.DataFrame | np.ndarray,
                                 period: int, offset: int | None = None,
                                 n_high_freq: int | None = None) -> np.ndarray:
    """Expand low-frequency observations to a NaN-padded high-frequency grid.

    Role parity with ``gEconpy/model/statespace.py:1432``: a series observed
    every ``period`` sub-periods is placed at sub-period ``offset`` (default
    ``period - 1``, end-of-period observation) with NaN elsewhere, ready for
    the missing-data Kalman filter (typically paired with an ``aggregate``
    observation equation).
    """
    arr = np.asarray(low_freq, dtype=float)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_low, k = arr.shape
    offset = period - 1 if offset is None else offset
    total = n_high_freq if n_high_freq is not None else n_low * period
    out = np.full((total, k), np.nan)
    rows = offset + period * np.arange(n_low)
    rows = rows[rows < total]
    out[rows] = arr[:len(rows)]
    return out
