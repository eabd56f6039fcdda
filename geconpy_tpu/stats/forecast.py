"""Out-of-sample forecasting: posterior fan charts and conditional paths.

No counterpart in the reference gEconpy (beyond-parity; the standard
DSGE-toolbox features are Dynare's ``forecast`` and
``conditional_forecast``).  Everything is per-posterior-draw device work:
one Kalman filter pass to the end of the sample, then scans over the
forecast horizon, vmapped over draws.

- :func:`posterior_forecast` — unconditional fan charts: parameter
  uncertainty (posterior draws) x state uncertainty (filtered terminal
  covariance) x future-shock uncertainty (and measurement error), as
  quantile bands per observable.
- :func:`conditional_forecast` — Waggoner-Zha style hard conditioning:
  find the minimum-variance (Q-weighted least-norm) structural-shock paths
  that make chosen observables follow chosen paths, and report the implied
  forecasts of everything else, with posterior bands and the implied
  shocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops.kalman import kalman_filter
from ..ops.precision import highest_precision
from .posterior import _flat_draws
from .statespace import DSGEStateSpace

__all__ = ["posterior_forecast", "conditional_forecast"]


def _quantile_frame(paths: np.ndarray, names, horizon: int, quantiles):
    """(draws_total, horizon, k) -> DataFrame[(variable, time), stats]."""
    index = pd.MultiIndex.from_product(
        [names, range(1, horizon + 1)], names=["variable", "time"])
    flat = paths.transpose(2, 1, 0).reshape(len(index), -1)
    out = pd.DataFrame(index=index)
    out["mean"] = flat.mean(axis=1)
    for q in quantiles:
        out[f"q{q}"] = np.quantile(flat, q, axis=1)
    return out


def posterior_forecast(
    ss_mod: DSGEStateSpace,
    result,
    data: np.ndarray,
    horizon: int = 12,
    max_draws: int | None = 500,
    n_paths_per_draw: int = 4,
    include_measurement_error: bool = True,
    quantiles=(0.05, 0.16, 0.5, 0.84, 0.95),
    seed: int = 0,
) -> pd.DataFrame:
    """Fan-chart forecast of the observables after the end of ``data``.

    Per posterior draw: filter the sample to the terminal state
    distribution N(x_T|T, P_T|T), then simulate ``n_paths_per_draw``
    forward paths with terminal-state, structural-shock and (optionally)
    measurement-error uncertainty.  Returns a DataFrame indexed by
    (variable, time 1..horizon) with mean + quantile columns.
    """
    solve_draw = ss_mod.build_solution_fn(full_state=True)
    y = jnp.asarray(data)
    obs_names = list(ss_mod.observed_states)

    def one_draw(u, key):
        sol = solve_draw(u)
        T, R = sol["T_aug"], sol["R_aug"]
        Q, Z, H, d = sol["Q"], sol["Z"], sol["H"], sol["d"]
        filt = kalman_filter(y, T, R, Q, Z, H, d=d)
        xT = filt.filtered_mean[-1]
        PT = filt.filtered_cov[-1]
        # PSD square root of the terminal covariance (filtered covs can be
        # numerically semidefinite — eigh is robust where cholesky is not)
        w, V = jnp.linalg.eigh(PT)
        L0 = V * jnp.sqrt(jnp.clip(w, 0.0))[None, :]
        Lq = jnp.linalg.cholesky(Q + 1e-30 * jnp.eye(Q.shape[0], dtype=Q.dtype))
        sd_me = jnp.sqrt(jnp.clip(jnp.diagonal(H), 0.0))

        def one_path(k):
            k0, ke, km = jax.random.split(k, 3)
            x0 = xT + L0 @ jax.random.normal(k0, (T.shape[0],), T.dtype)
            eps = jax.random.normal(ke, (horizon, Q.shape[0]), T.dtype)
            eta = jax.random.normal(km, (horizon, Z.shape[0]), T.dtype)

            def step(x, inp):
                e, m = inp
                x = T @ x + R @ (Lq @ e)
                yh = Z @ x + d
                if include_measurement_error:
                    yh = yh + sd_me * m
                return x, yh

            _, ys = jax.lax.scan(step, x0, (eps, eta))
            return ys                                   # (horizon, k_obs)

        return jax.vmap(one_path)(jax.random.split(key, n_paths_per_draw))

    us = _flat_draws(result, max_draws)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(us))
    paths = np.asarray(jax.jit(jax.vmap(one_draw))(us, keys))
    paths = paths.reshape(-1, horizon, len(obs_names))
    return _quantile_frame(paths, obs_names, horizon, quantiles)


@highest_precision
def _conditional_core(T, R, Q, Z, d, xT, target, mask, horizon: int):
    """Q-weighted least-norm shocks hitting the masked targets exactly.

    target/mask: (horizon, k_obs) with mask True where conditioned.
    Returns (ys, eps) — observable paths and implied structural shocks.
    """
    k_obs = Z.shape[0]
    n_shocks = Q.shape[0]

    def base_step(x, _):
        x = T @ x
        return x, Z @ x + d

    _, baseline = jax.lax.scan(base_step, xT, None, length=horizon)

    # Psi_j = Z T^j R  (impact of a time-s shock on time-(s+j) observables)
    def psi_step(P, _):
        return T @ P, Z @ P

    _, Psi = jax.lax.scan(psi_step, R, None, length=horizon)  # (H, k_obs, n_shocks)

    # stacked constraint matrix over (condition rows) x (shock path):
    # M[(h, i), (s, j)] = Psi[h-s][i, j] for s <= h
    hh = jnp.arange(horizon)
    lag = hh[:, None] - hh[None, :]                         # (H, H)
    Psi_lag = jnp.where(
        (lag >= 0)[:, :, None, None],
        Psi[jnp.clip(lag, 0), :, :], 0.0)                   # (H, H, k_obs, n_shocks)
    M_full = jnp.transpose(Psi_lag, (0, 2, 1, 3)).reshape(
        horizon * k_obs, horizon * n_shocks)

    m = mask.reshape(-1)
    r = jnp.where(m, (target - baseline).reshape(-1), 0.0)
    Msel = jnp.where(m[:, None], M_full, 0.0)               # zero out free rows

    # minimize sum_s eps_s' Q^{-1} eps_s  s.t.  Msel eps = r (masked rows).
    # Gram uses only masked rows; free rows contribute zero and keep the
    # system at static shape — regularize their diagonal so it stays
    # invertible, which leaves masked-row solutions untouched.
    Qblk = jnp.kron(jnp.eye(horizon, dtype=Q.dtype), Q)
    G = Msel @ Qblk @ Msel.T
    ridge = jnp.where(m, 0.0, 1.0)
    lam = jnp.linalg.solve(G + jnp.diag(ridge), r)
    eps = (Qblk @ Msel.T @ lam).reshape(horizon, n_shocks)

    def step(x, e):
        x = T @ x + R @ e
        return x, Z @ x + d

    _, ys = jax.lax.scan(step, xT, eps)
    return ys, eps, baseline


def conditional_forecast(
    ss_mod: DSGEStateSpace,
    result,
    data: np.ndarray,
    conditions: dict[str, np.ndarray],
    horizon: int = 12,
    max_draws: int | None = 200,
    quantiles=(0.05, 0.5, 0.95),
):
    """Forecast with some observables constrained to given future paths.

    ``conditions`` maps observable names to arrays of future values
    (length <= horizon; ``NaN`` entries are unconstrained).  For each
    posterior draw, the Q-weighted least-norm structural-shock paths that
    reproduce the constrained entries exactly (hard conditioning à la
    Waggoner-Zha 1999) are computed in closed form, and every observable
    is propagated under those shocks from the filtered terminal state.
    Measurement error is excluded: conditions bind the model-implied
    observables.

    Returns ``(forecast, shocks)`` DataFrames: (variable, time) and
    (shock, time) indexed, each with mean + quantile columns over draws.
    """
    obs_names = list(ss_mod.observed_states)
    mf = ss_mod.model.functions
    target = np.zeros((horizon, len(obs_names)))
    mask = np.zeros((horizon, len(obs_names)), dtype=bool)
    for name, path in conditions.items():
        if name not in obs_names:
            raise KeyError(f"{name!r} is not an observed state "
                           f"(observed: {obs_names})")
        j = obs_names.index(name)
        path = np.asarray(path, dtype=float).ravel()
        if len(path) > horizon:
            raise ValueError(f"condition on {name!r} longer than horizon")
        fin = np.isfinite(path)
        target[:len(path), j] = np.where(fin, path, 0.0)
        mask[:len(path), j] = fin
    if not mask.any():
        raise ValueError("conditions contain no finite entries")

    solve_draw = ss_mod.build_solution_fn(full_state=True)
    y = jnp.asarray(data)
    target_j = jnp.asarray(target)
    mask_j = jnp.asarray(mask)

    def one_draw(u):
        sol = solve_draw(u)
        T, R = sol["T_aug"], sol["R_aug"]
        Q, Z, H, d = sol["Q"], sol["Z"], sol["H"], sol["d"]
        filt = kalman_filter(y, T, R, Q, Z, H, d=d)
        xT = filt.filtered_mean[-1]
        ys, eps, _ = _conditional_core(
            T, R, Q, Z, d, xT, target_j.astype(T.dtype),
            mask_j, horizon)
        return ys, eps

    us = _flat_draws(result, max_draws)
    ys, eps = jax.jit(jax.vmap(one_draw))(us)
    forecast = _quantile_frame(np.asarray(ys), obs_names, horizon, quantiles)
    shocks = _quantile_frame(np.asarray(eps), mf.shock_names, horizon,
                             quantiles)
    return forecast, shocks
