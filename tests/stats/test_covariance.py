"""Unconditional-moment unit tests (stats/covariance.py).

Reference role: gEconpy/model/statistics/covariance.py (build_Q_matrix:20,
stationary_covariance_matrix:68, autocovariance_matrix:164).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import geconpy_tpu
from geconpy_tpu.stats.covariance import (
    autocorrelation,
    autocovariance,
    autocovariance_matrix,
    build_shock_cov,
    fevd,
    stationary_covariance,
    stationary_covariance_matrix,
)


def ar1_system(rho=0.8, sigma=0.1):
    T = jnp.array([[rho]])
    R = jnp.array([[1.0]])
    Q = jnp.array([[sigma**2]])
    return T, R, Q


def test_build_shock_cov_variants():
    Q = build_shock_cov(3)
    np.testing.assert_allclose(np.diag(np.asarray(Q)), [1e-4] * 3)

    Q = build_shock_cov(2, shock_std=[0.1, 0.2])
    np.testing.assert_allclose(np.diag(np.asarray(Q)), [0.01, 0.04])

    full = np.array([[1.0, 0.5], [0.5, 2.0]])
    Q = build_shock_cov(2, shock_cov=full)
    np.testing.assert_allclose(np.asarray(Q), full)


def test_ar1_stationary_variance():
    rho, sigma = 0.8, 0.1
    T, R, Q = ar1_system(rho, sigma)
    Sigma = stationary_covariance(T, R, Q)
    np.testing.assert_allclose(
        float(Sigma[0, 0]), sigma**2 / (1 - rho**2), rtol=1e-10)


def test_ar1_autocorrelation_is_rho_powers():
    rho = 0.7
    T, R, Q = ar1_system(rho)
    acf = autocorrelation(T, R, Q, n_lags=6)
    np.testing.assert_allclose(
        np.asarray(acf).ravel(), [rho**k for k in range(6)], rtol=1e-8)


def test_autocovariance_lag0_is_sigma():
    T = jnp.array([[0.9, 0.1], [0.0, 0.5]])
    R = jnp.eye(2)
    Q = jnp.diag(jnp.array([0.01, 0.04]))
    gammas = autocovariance(T, R, Q, n_lags=4)
    Sigma = stationary_covariance(T, R, Q)
    np.testing.assert_allclose(np.asarray(gammas[0]), np.asarray(Sigma), rtol=1e-12)
    # Gamma_k = T^k Sigma
    np.testing.assert_allclose(
        np.asarray(gammas[3]),
        np.asarray(T @ T @ T @ Sigma), rtol=1e-10)


def test_fevd_rows_sum_to_one_and_match_analytic():
    # two independent AR(1)s, each driven by its own shock: FEVD is identity
    T = jnp.diag(jnp.array([0.9, 0.4]))
    R = jnp.eye(2)
    Q = jnp.diag(jnp.array([0.01, 0.09]))
    shares = fevd(T, R, Q, horizon=10)
    assert shares.shape == (10, 2, 2)
    np.testing.assert_allclose(np.asarray(shares.sum(-1)), 1.0, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(shares[-1]), np.eye(2), atol=1e-12)


def test_fevd_mixed_loading():
    # variable 0 loads on both shocks; at horizon 1 shares follow impact^2
    T = jnp.zeros((1, 1))
    R = jnp.array([[1.0, 2.0]])
    Q = jnp.eye(2)
    shares = fevd(T, R, Q, horizon=1)
    np.testing.assert_allclose(np.asarray(shares[0, 0]), [1 / 5, 4 / 5], rtol=1e-12)


@pytest.fixture(scope="module")
def rbc_solution():
    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc"),
                                       verbose=False)
    return model.solve_model()


def test_labeled_wrappers_on_rbc(rbc_solution):
    Sigma = stationary_covariance_matrix(rbc_solution, shock_std=0.01)
    assert (Sigma.index == Sigma.columns).all()
    # a covariance matrix: symmetric PSD
    np.testing.assert_allclose(Sigma.values, Sigma.values.T, atol=1e-12)
    assert np.all(scipy.linalg.eigvalsh(Sigma.values) > -1e-12)

    acf = autocovariance_matrix(rbc_solution, n_lags=5, shock_std=0.01)
    assert acf.index.names == ["lag", "variable"]
    lag0 = acf.loc[0]
    np.testing.assert_allclose(np.diag(lag0.values), 1.0, rtol=1e-8)
    assert np.abs(acf.loc[4].values).max() <= 1.0 + 1e-8
