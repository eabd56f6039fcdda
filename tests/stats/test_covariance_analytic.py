"""Second-moment tooling against closed-form AR/VAR oracles.

AR(1) and structured 2-variable systems have textbook covariance/ACF/FEVD
formulas; these pin ``stats/covariance.py`` beyond the simulation
cross-checks in test_simulate.py.
"""

import jax.numpy as jnp
import numpy as np

from geconpy_tpu.stats.covariance import (
    autocovariance,
    fevd,
    stationary_covariance,
)


def _ar1(rho=0.8, sigma=0.3):
    T = jnp.array([[rho]])
    R = jnp.array([[1.0]])
    Q = jnp.array([[sigma ** 2]])
    return T, R, Q


def test_ar1_stationary_variance_closed_form():
    rho, sigma = 0.8, 0.3
    T, R, Q = _ar1(rho, sigma)
    G0 = stationary_covariance(T, R, Q)
    np.testing.assert_allclose(float(G0[0, 0]),
                               sigma ** 2 / (1 - rho ** 2), rtol=1e-10)


def test_ar1_autocorrelation_is_rho_to_k():
    rho = 0.65
    T, R, Q = _ar1(rho, 0.2)
    acv = autocovariance(T, R, Q, n_lags=7)
    G0 = float(acv[0][0, 0])
    for k in range(1, 7):
        np.testing.assert_allclose(float(acv[k][0, 0]) / G0, rho ** k,
                                   rtol=1e-9, err_msg=f"lag {k}")


def test_near_unit_root_variance_still_accurate():
    """The doubling Lyapunov must stay accurate at rho = 0.999 where the
    variance is ~500x the shock variance."""
    rho, sigma = 0.999, 0.1
    T, R, Q = _ar1(rho, sigma)
    G0 = stationary_covariance(T, R, Q)
    np.testing.assert_allclose(float(G0[0, 0]),
                               sigma ** 2 / (1 - rho ** 2), rtol=1e-8)


def test_var1_cross_covariance_closed_form():
    """2-variable system x2 = b x1(-1) + e2: Gamma solves the discrete
    Lyapunov equation exactly (dense scipy oracle)."""
    import scipy.linalg as sla

    T = jnp.array([[0.7, 0.0], [0.4, 0.5]])
    R = jnp.eye(2)
    Q = jnp.diag(jnp.array([0.09, 0.04]))
    G0 = np.asarray(stationary_covariance(T, R, Q))
    G0_ref = sla.solve_discrete_lyapunov(np.asarray(T), np.asarray(Q))
    np.testing.assert_allclose(G0, G0_ref, rtol=1e-9)
    # lag-k cross-covariances: Gamma_k = T^k Gamma_0
    acv = autocovariance(T, R, Q, n_lags=4)
    Tk = np.eye(2)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(acv[k]), Tk @ G0_ref,
                                   rtol=1e-8, atol=1e-12, err_msg=f"lag {k}")
        Tk = np.asarray(T) @ Tk


def test_fevd_independent_components_are_unit_shares():
    """Two decoupled AR(1)s each driven by its own shock: the FEVD is the
    identity at every horizon."""
    T = jnp.diag(jnp.array([0.8, 0.5]))
    R = jnp.eye(2)
    Q = jnp.diag(jnp.array([0.1, 0.9]))
    shares = np.asarray(fevd(T, R, Q, horizon=12))   # (horizon, n, k)
    for h in range(12):
        np.testing.assert_allclose(shares[h], np.eye(2), atol=1e-10,
                                   err_msg=f"horizon {h}")


def test_fevd_shares_sum_to_one_and_match_manual_horizon1():
    T = jnp.array([[0.7, 0.2], [0.1, 0.6]])
    R = jnp.array([[1.0, 0.3], [0.0, 1.0]])
    Q = jnp.diag(jnp.array([0.04, 0.09]))
    shares = np.asarray(fevd(T, R, Q, horizon=1))[0]
    np.testing.assert_allclose(shares.sum(axis=1), 1.0, rtol=1e-10)
    # horizon-1 variance of variable i from orthogonalized shock j:
    # impact = R chol(Q); contribution = impact_ij^2
    contrib = (np.asarray(R) @ np.linalg.cholesky(np.asarray(Q))) ** 2
    np.testing.assert_allclose(shares, contrib / contrib.sum(1, keepdims=True),
                               rtol=1e-10)
