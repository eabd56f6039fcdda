"""Structural properties of the simulation / IRF layer: linearity,
superposition, per-shock sizing, orthogonalization identities, seeded
covariance scaling — invariants any first-order linear solution must obey,
asserted to tight tolerances rather than smoke-checked.

Coverage model: the reference's IRF option matrix
(``gEconpy/model/simulate.py:201`` ShockSpec size/cov/trajectory,
orthogonalize via Cholesky at ``:122``).
"""

import pathlib

import numpy as np
import pytest

from geconpy_tpu import impulse_response_function, model_from_gcn, simulate
from geconpy_tpu.analysis.simulate import impulse_response, simulate_linear

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def sol():
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    return model.solve_model(verbose=False)


def test_irf_is_linear_in_shock_size(sol):
    irf1 = impulse_response_function(sol, periods=20, shock_size=1.0)
    irf3 = impulse_response_function(sol, periods=20, shock_size=3.0)
    np.testing.assert_allclose(irf3.to_numpy(), 3.0 * irf1.to_numpy(),
                               rtol=1e-6, atol=1e-12)


def test_irf_shock_size_dict_scales_only_named_shock(sol):
    shocks = list(sol.R.columns)
    base = impulse_response_function(sol, periods=20, shock_size=1.0)
    scaled = impulse_response_function(
        sol, periods=20, shock_size={shocks[0]: 5.0})
    np.testing.assert_allclose(scaled.loc[shocks[0]].to_numpy(),
                               5.0 * base.loc[shocks[0]].to_numpy(),
                               rtol=1e-6)
    for s in shocks[1:]:
        np.testing.assert_allclose(scaled.loc[s].to_numpy(),
                                   base.loc[s].to_numpy(), rtol=1e-6)


def test_shock_trajectory_superposition(sol):
    """A path with impulses at t=0 and t=5 equals the sum of the IRF and
    the same IRF delayed 5 periods (linearity in the shock path)."""
    T = sol.T.to_numpy()
    R = sol.R.to_numpy()
    n_shocks = R.shape[1]
    periods = 24

    eps = np.zeros((periods, n_shocks))
    eps[0, 0] = 1.0
    eps[5, 0] = -0.5
    joint = np.asarray(simulate_linear(T, R, eps))

    irf = np.asarray(impulse_response(T, R, periods=periods))[0]  # shock 0
    delayed = np.zeros_like(irf)
    delayed[5:] = irf[:-5]
    np.testing.assert_allclose(joint, irf - 0.5 * delayed,
                               rtol=1e-6, atol=1e-10)


def test_orthogonalized_impacts_reproduce_shock_covariance(sol):
    """One-std orthogonalized impulses are the Cholesky columns, so the sum
    of outer products of the period-0 state responses must equal R Σ Rᵀ."""
    rng = np.random.default_rng(0)
    n_shocks = sol.R.shape[1]
    A = rng.standard_normal((n_shocks, n_shocks))
    cov = A @ A.T / n_shocks + np.eye(n_shocks) * 0.1

    irf = impulse_response_function(sol, periods=4, orthogonalize=True,
                                    shock_cov=cov)
    R = sol.R.to_numpy()
    impact = np.stack([irf.loc[s].to_numpy()[0] for s in sol.R.columns])
    np.testing.assert_allclose(impact.T @ impact, R @ cov @ R.T,
                               rtol=1e-6, atol=1e-10)


def test_orthogonalize_with_diagonal_cov_scales_unit_irfs(sol):
    n_shocks = sol.R.shape[1]
    stds = np.linspace(0.5, 2.0, n_shocks)
    irf_orth = impulse_response_function(sol, periods=12, orthogonalize=True,
                                         shock_cov=np.diag(stds ** 2))
    irf_unit = impulse_response_function(sol, periods=12, shock_size=1.0)
    for s, sd in zip(sol.R.columns, stds):
        np.testing.assert_allclose(irf_orth.loc[s].to_numpy(),
                                   sd * irf_unit.loc[s].to_numpy(),
                                   rtol=1e-6, atol=1e-12)


def test_orthogonalize_requires_cov(sol):
    with pytest.raises(ValueError, match="shock_cov"):
        impulse_response_function(sol, orthogonalize=True)


def test_simulate_paths_scale_with_cov_at_fixed_seed(sol):
    """Same seed, covariance scaled by 4 -> every path scales by exactly 2
    (the driver draws standard normals and colors them by the Cholesky)."""
    n_shocks = sol.R.shape[1]
    cov = 0.01 * np.eye(n_shocks)
    a = simulate(sol, periods=15, n_simulations=8, shock_cov=cov, seed=3)
    b = simulate(sol, periods=15, n_simulations=8, shock_cov=4 * cov, seed=3)
    np.testing.assert_allclose(b.to_numpy(), 2.0 * a.to_numpy(), rtol=1e-5)


def test_simulate_shock_std_dict_silences_named_shock(sol):
    """Setting one shock's std to zero changes nothing about the other
    shocks' randomness: the path difference from the baseline must lie in
    the silenced shock's response space."""
    shocks = list(sol.R.columns)
    base = {s: 0.01 for s in shocks}
    silenced = dict(base, **{shocks[0]: 0.0})
    a = simulate(sol, periods=10, n_simulations=4, shock_std=base, seed=7)
    b = simulate(sol, periods=10, n_simulations=4, shock_std=silenced, seed=7)
    diff = a.to_numpy() - b.to_numpy()
    assert np.abs(diff).max() > 0  # the silenced shock did matter
    # the difference is exactly the silenced shock's contribution:
    # re-adding it (same seed -> same standard-normal draws) restores a
    c = simulate(sol, periods=10, n_simulations=4, shock_std=base, seed=7)
    np.testing.assert_allclose(c.to_numpy(), a.to_numpy(), rtol=0, atol=0)


def test_simulate_linear_zero_shocks_is_matrix_power(sol):
    T = sol.T.to_numpy()
    R = sol.R.to_numpy()
    n = T.shape[0]
    x0 = np.linspace(-1.0, 1.0, n)
    path = np.asarray(simulate_linear(T, R, np.zeros((6, R.shape[1])), x0=x0))
    expect = x0.copy()
    for t in range(6):
        expect = T @ expect
        np.testing.assert_allclose(path[t], expect, rtol=1e-6, atol=1e-12)


def test_simulate_linear_batched_matches_loop(sol):
    T = sol.T.to_numpy()
    R = sol.R.to_numpy()
    rng = np.random.default_rng(1)
    eps = rng.standard_normal((5, 12, R.shape[1]))
    batched = np.asarray(simulate_linear(T, R, eps))
    for b in range(5):
        np.testing.assert_allclose(batched[b],
                                   np.asarray(simulate_linear(T, R, eps[b])),
                                   rtol=1e-6, atol=1e-12)


def test_irf_dataframe_labels_match_solution(sol):
    irf = impulse_response_function(sol, periods=7)
    assert list(irf.columns) == list(sol.T.columns)
    assert set(irf.index.get_level_values("shock")) == set(sol.R.columns)
    assert irf.loc[sol.R.columns[0]].shape[0] == 7
