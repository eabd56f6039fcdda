"""Stochastic simulation and impulse responses as batched device scans.

Role parity with ``gEconpy/model/simulate.py`` (simulate:320,
impulse_response_function:201).  TPU-first: the linear state recursion is a
``lax.scan``; simulations are vmapped over draws, so thousands of paths run
as one XLA program.  Results come back as labeled pandas objects on the host.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ["simulate_linear", "impulse_response", "simulate",
           "impulse_response_function", "simulate_second_order",
           "impulse_response_second_order"]


def simulate_linear(T, R, shocks, x0=None):
    """Run  x_t = T x_{t-1} + R eps_t  over a shock path.

    shocks: (periods, n_shocks) or (batch, periods, n_shocks).
    Returns matching (periods, n) / (batch, periods, n).
    """
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    shocks = jnp.asarray(shocks)

    def one_path(eps_path, x_init):
        def step(x, eps):
            x_new = T @ x + R @ eps
            return x_new, x_new

        _, path = jax.lax.scan(step, x_init, eps_path)
        return path

    n = T.shape[0]
    if shocks.ndim == 2:
        x_init = jnp.zeros(n, T.dtype) if x0 is None else jnp.asarray(x0)
        return one_path(shocks, x_init)
    batch = shocks.shape[0]
    if x0 is None:
        x0 = jnp.zeros((batch, n), T.dtype)
    return jax.vmap(one_path)(shocks, jnp.asarray(x0))


def simulate(
    solution,
    periods: int = 40,
    n_simulations: int = 100,
    shock_cov: np.ndarray | None = None,
    shock_std: float | dict | None = None,
    seed: int = 0,
):
    """Monte-carlo simulation of the solved model.

    ``solution`` is a :class:`~geconpy_tpu.models.model.PolicySolution`.
    Returns a DataFrame with MultiIndex (simulation, time) over variables.
    """
    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    n_shocks = R.shape[1]
    shock_names = list(solution.R.columns)

    if shock_cov is None:
        if shock_std is None:
            stds = np.full(n_shocks, 0.01)
        elif isinstance(shock_std, dict):
            stds = np.array([float(shock_std.get(s, 0.01)) for s in shock_names])
        else:
            stds = np.full(n_shocks, float(shock_std))
        chol = np.diag(stds)
    else:
        chol = np.linalg.cholesky(np.asarray(shock_cov))

    key = jax.random.PRNGKey(seed)
    draws = jax.random.normal(key, (n_simulations, periods, n_shocks),
                              dtype=jnp.asarray(T).dtype)
    eps = draws @ jnp.asarray(chol).T
    paths = jax.jit(simulate_linear)(T, R, eps)

    arr = np.asarray(paths)
    index = pd.MultiIndex.from_product(
        [range(n_simulations), range(periods)], names=["simulation", "time"])
    return pd.DataFrame(arr.reshape(-1, arr.shape[-1]), index=index,
                        columns=solution.T.columns)


def impulse_response(T, R, periods: int = 40, shock_size=1.0,
                     shock_trajectory=None):
    """IRFs for every shock: returns (n_shocks, periods, n_variables).

    ``shock_size`` scalar or (n_shocks,); or pass an explicit
    ``shock_trajectory`` (periods, n_shocks) applied jointly.
    """
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    n_shocks = R.shape[1]

    if shock_trajectory is not None:
        eps = jnp.asarray(shock_trajectory)
        return simulate_linear(T, R, eps)

    sizes = jnp.broadcast_to(jnp.asarray(shock_size, T.dtype), (n_shocks,))

    def one_shock(j_onehot):
        eps = jnp.zeros((periods, n_shocks), T.dtype).at[0].set(j_onehot)
        return simulate_linear(T, R, eps)

    impulses = jnp.eye(n_shocks, dtype=T.dtype) * sizes[:, None]
    return jax.vmap(one_shock)(impulses)


def impulse_response_function(
    solution,
    periods: int = 40,
    shock_size: float | dict = 1.0,
    orthogonalize: bool = False,
    shock_cov: np.ndarray | None = None,
) -> pd.DataFrame:
    """Labeled IRFs: DataFrame with MultiIndex (shock, time) over variables.

    With ``orthogonalize=True`` and a shock covariance, impulses are the
    Cholesky columns (one-standard-deviation orthogonalized shocks).
    """
    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    shock_names = list(solution.R.columns)
    n_shocks = len(shock_names)

    if orthogonalize:
        if shock_cov is None:
            raise ValueError("orthogonalize=True requires shock_cov")
        chol = np.linalg.cholesky(np.asarray(shock_cov))
        paths = []
        for j in range(n_shocks):
            eps = np.zeros((periods, n_shocks))
            eps[0] = chol[:, j]
            paths.append(np.asarray(jax.jit(simulate_linear)(T, R, eps)))
        arr = np.stack(paths)
    else:
        if isinstance(shock_size, dict):
            sizes = np.array([float(shock_size.get(s, 1.0)) for s in shock_names])
        else:
            sizes = shock_size
        arr = np.asarray(jax.jit(
            lambda t, r: impulse_response(t, r, periods, jnp.asarray(sizes)))(T, R))

    index = pd.MultiIndex.from_product([shock_names, range(periods)],
                                       names=["shock", "time"])
    return pd.DataFrame(arr.reshape(-1, arr.shape[-1]), index=index,
                        columns=solution.T.columns)


# ------------------------------------------------------- second order


def simulate_second_order(
    solution,
    second_order,
    periods: int = 40,
    n_simulations: int = 100,
    shock_std: float | dict | None = None,
    shock_cov: np.ndarray | None = None,
    seed: int = 0,
) -> pd.DataFrame:
    """Monte-carlo simulation of the pruned second-order solution.

    ``second_order`` is the :class:`~geconpy_tpu.models.second_order
    .SecondOrderResult` from ``Model.solve_model_second_order``.  Same
    labeled output as :func:`simulate` — MultiIndex (simulation, time) over
    variables, in hat coordinates (including the uncertainty correction, so
    sample means sit at the stochastic steady state, not the deterministic
    one).  Beyond reference parity: gEconpy simulates first order only.
    """
    from ..models.second_order import simulate_pruned

    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    n_shocks = R.shape[1]
    shock_names = list(solution.R.columns)

    if shock_cov is None:
        if shock_std is None:
            stds = np.full(n_shocks, 0.01)
        elif isinstance(shock_std, dict):
            stds = np.array([float(shock_std.get(s, 0.01)) for s in shock_names])
        else:
            stds = np.full(n_shocks, float(shock_std))
        chol = np.diag(stds)
    else:
        chol = np.linalg.cholesky(np.asarray(shock_cov))

    key = jax.random.PRNGKey(seed)
    draws = jax.random.normal(key, (n_simulations, periods, n_shocks),
                              dtype=jnp.asarray(T).dtype)
    eps = draws @ jnp.asarray(chol).T
    paths = jax.jit(jax.vmap(
        lambda e: simulate_pruned(T, R, second_order, e)))(eps)

    arr = np.asarray(paths)
    index = pd.MultiIndex.from_product(
        [range(n_simulations), range(periods)], names=["simulation", "time"])
    return pd.DataFrame(arr.reshape(-1, arr.shape[-1]), index=index,
                        columns=solution.T.columns)


def impulse_response_second_order(
    solution,
    second_order,
    periods: int = 40,
    shock_size: float | dict = 1.0,
) -> pd.DataFrame:
    """Labeled second-order IRFs (difference of pruned paths with and
    without the impulse — sign- and size-dependent, unlike first order).
    DataFrame with MultiIndex (shock, time) over variables."""
    from ..models.second_order import irf_second_order

    T = solution.T.to_numpy()
    R = solution.R.to_numpy()
    shock_names = list(solution.R.columns)
    n_shocks = len(shock_names)
    if isinstance(shock_size, dict):
        sizes = np.array([float(shock_size.get(s, 1.0)) for s in shock_names])
    else:
        sizes = np.full(n_shocks, float(shock_size))

    paths = []
    for j in range(n_shocks):
        vec = np.zeros(n_shocks)
        vec[j] = sizes[j]
        paths.append(np.asarray(jax.jit(
            lambda v: irf_second_order(T, R, second_order, v, periods))(
                jnp.asarray(vec))))
    arr = np.stack(paths)
    index = pd.MultiIndex.from_product([shock_names, range(periods)],
                                       names=["shock", "time"])
    return pd.DataFrame(arr.reshape(-1, arr.shape[-1]), index=index,
                        columns=solution.T.columns)
