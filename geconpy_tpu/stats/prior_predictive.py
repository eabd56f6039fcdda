"""Prior/posterior predictive sweeps sharded over a device mesh.

The pod-scale workload (BASELINE.json config 5: "10k-draw prior/posterior
sweep across a pod slice"): for every parameter draw, solve the model and
compute IRFs + FEVD + moments, with draws sharded over the mesh via
shard_map (ICI data-parallel; the only cross-device communication is the
final gather of small summary arrays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..dists import resolve_priors
from .covariance import fevd as _fevd
from .statespace import DSGEStateSpace

__all__ = ["prior_predictive_sweep"]


def prior_predictive_sweep(
    ss_mod: DSGEStateSpace,
    n_draws: int = 1000,
    periods: int = 40,
    fevd_horizon: int = 20,
    seed: int = 0,
    mesh=None,
    quantiles=(0.05, 0.5, 0.95),
):
    """Sweep the priors: per-draw solve -> IRFs, FEVD, stationary sd.

    Returns a dict with:
    - ``"irf"``: DataFrame (shock, variable, time) with quantile bands over
      successful draws,
    - ``"fevd"``: mean FEVD shares (variable x shock),
    - ``"std"``: DataFrame of stationary standard deviations (quantiles),
    - ``"success_rate"``: fraction of solvable draws.

    With ``mesh`` the draw axis is sharded over the devices.
    """
    model = ss_mod.model
    mf = model.functions
    n_shocks = mf.n_shocks
    solve_draw = ss_mod.build_solution_fn()

    # draws in unconstrained space directly from the priors
    param_priors, _ = resolve_priors(model.primitives.priors,
                                     model.primitives.shock_priors)
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, len(ss_mod.estimated))
    cols = []
    for p, k in zip(ss_mod.estimated, keys):
        x = p.prior.sample(k, (n_draws,))
        cols.append(jax.vmap(p.prior.to_unconstrained)(x))
    U = jnp.stack(cols, axis=1)

    def per_draw(u):
        sol = solve_draw(u)
        T, R, Q = sol["T"], sol["R"], sol["Q"]
        ok = sol["ss_success"] & sol["solver_success"] & sol["stable"]
        sd_shocks = jnp.sqrt(jnp.diagonal(Q))

        def one_shock(j_onehot):
            def step(x, _):
                return T @ x, x

            _, path = jax.lax.scan(step, R @ j_onehot, None, length=periods)
            return path

        impulses = jnp.eye(n_shocks, dtype=T.dtype) * sd_shocks[:, None]
        irfs = jax.vmap(one_shock)(impulses)        # (shocks, periods, n)

        shares = _fevd(T, R, Q, fevd_horizon)[-1]    # (n, shocks)

        from ..ops.lyapunov import solve_discrete_lyapunov

        T_safe = jnp.where(ok, T, jnp.zeros_like(T))
        Sigma = solve_discrete_lyapunov(T_safe, R @ Q @ R.T)
        stds = jnp.sqrt(jnp.clip(jnp.diagonal(Sigma), 0.0))
        return irfs, shares, stds, ok

    if mesh is not None:
        from ..parallel.mesh import sharded_prior_sweep

        irfs, shares, stds, ok = sharded_prior_sweep(per_draw, U, mesh)
    else:
        irfs, shares, stds, ok = jax.jit(jax.vmap(per_draw))(U)

    ok_np = np.asarray(ok)
    irfs_np = np.asarray(irfs)[ok_np]
    shares_np = np.asarray(shares)[ok_np]
    stds_np = np.asarray(stds)[ok_np]

    irf_index = pd.MultiIndex.from_product(
        [mf.shock_names, mf.variable_names, range(periods)],
        names=["shock", "variable", "time"])
    flat = irfs_np.transpose(1, 3, 2, 0).reshape(len(irf_index), -1)
    irf_df = pd.DataFrame(index=irf_index)
    irf_df["mean"] = flat.mean(axis=1)
    for q in quantiles:
        irf_df[f"q{q}"] = np.quantile(flat, q, axis=1)

    fevd_df = pd.DataFrame(shares_np.mean(axis=0), index=mf.variable_names,
                           columns=mf.shock_names)
    std_df = pd.DataFrame(
        {"mean": stds_np.mean(axis=0),
         **{f"q{q}": np.quantile(stds_np, q, axis=0) for q in quantiles}},
        index=mf.variable_names)

    return {
        "irf": irf_df,
        "fevd": fevd_df,
        "std": std_df,
        "success_rate": float(ok_np.mean()),
    }
