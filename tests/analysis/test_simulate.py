import pathlib

import numpy as np
import pytest

from geconpy_tpu import model_from_gcn, simulate, impulse_response_function
from geconpy_tpu.stats.covariance import (
    autocovariance_matrix,
    build_shock_cov,
    fevd,
    stationary_covariance,
    stationary_covariance_matrix,
)

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def rbc_solution():
    model = model_from_gcn(str(DATA / "rbc.gcn"))
    return model.solve_model()


def test_irf_shapes_and_signs(rbc_solution):
    irf = impulse_response_function(rbc_solution, periods=40)
    assert irf.shape == (40, 9)
    # technology shock: impact period
    assert irf.loc[("epsilon_A", 0), "Y"] > 0
    assert irf.loc[("epsilon_A", 0), "A"] == pytest.approx(1.0)
    # IRF decays (stable model)
    assert abs(irf.loc[("epsilon_A", 39), "Y"]) < abs(irf.loc[("epsilon_A", 0), "Y"])


def test_irf_matches_manual_recursion(rbc_solution):
    T = rbc_solution.T.to_numpy()
    R = rbc_solution.R.to_numpy()
    irf = impulse_response_function(rbc_solution, periods=10)
    x = R[:, 0]
    for t in range(10):
        np.testing.assert_allclose(
            irf.loc[("epsilon_A", t)].to_numpy(), x, atol=1e-12)
        x = T @ x


def test_simulate(rbc_solution):
    df = simulate(rbc_solution, periods=50, n_simulations=20, shock_std=0.01,
                  seed=42)
    assert df.shape == (20 * 50, 9)
    # simulations stay bounded (stable dynamics, small shocks)
    assert np.abs(df.to_numpy()).max() < 1.0
    # different sims differ
    s0 = df.loc[0].to_numpy()
    s1 = df.loc[1].to_numpy()
    assert np.abs(s0 - s1).max() > 0


def test_stationary_covariance_matches_simulation(rbc_solution):
    """Analytic stationary variance ~ long-simulation sample variance."""
    Sigma = stationary_covariance_matrix(rbc_solution, shock_std=0.01)
    df = simulate(rbc_solution, periods=20000, n_simulations=4,
                  shock_std=0.01, seed=7)
    sample_var = df["Y"].to_numpy().var()
    np.testing.assert_allclose(Sigma.loc["Y", "Y"], sample_var, rtol=0.15)


def test_autocorrelation(rbc_solution):
    acf = autocovariance_matrix(rbc_solution, n_lags=5, shock_std=0.01)
    # lag 0 diagonal = 1 (correlations)
    lag0 = acf.loc[0]
    np.testing.assert_allclose(np.diag(lag0.to_numpy()), 1.0, atol=1e-8)
    # technology autocorrelation at lag k is rho^k
    for k in range(5):
        np.testing.assert_allclose(acf.loc[(k, "A"), "A"], 0.95**k, atol=1e-6)


def test_fevd_sums_to_one(rbc_solution):
    T = rbc_solution.T.to_numpy()
    R = rbc_solution.R.to_numpy()
    Q = build_shock_cov(R.shape[1], shock_std=0.01)
    shares = np.asarray(fevd(T, R, Q, horizon=20))
    np.testing.assert_allclose(shares.sum(axis=-1), 1.0, atol=1e-10)
