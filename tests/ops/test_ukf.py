"""Unscented filter oracle tests.

The unscented transform is exact for linear dynamics, so on a linear
Gaussian state space the UKF log-likelihood must equal the Kalman filter's
to machine precision — that is the oracle.  Nonlinear behavior is pinned by
a quadratic model where the UKF must track the analytically-known mean shift
a linear filter misses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.kalman import kalman_filter
from geconpy_tpu.ops.ukf import ukf_loglik


def _random_linear_ss(key, n=4, q=2, k=3):
    kT, kR, kZ = jax.random.split(key, 3)
    A = jax.random.normal(kT, (n, n)) * 0.3
    T = 0.8 * A / jnp.maximum(1.0, jnp.max(jnp.abs(jnp.linalg.eigvals(A))))
    T = jnp.real(T)
    R = jax.random.normal(kR, (n, q)) * 0.5
    Z = jax.random.normal(kZ, (k, n))
    Q = jnp.diag(jnp.array([0.04, 0.09][:q]))
    H = jnp.eye(k) * 0.01
    return T, R, Z, Q, H


def _simulate(key, T, R, Z, Q, H, periods=60):
    n, q = R.shape
    k = Z.shape[0]
    k1, k2 = jax.random.split(key)
    eps = jax.random.normal(k1, (periods, q)) @ jnp.linalg.cholesky(Q).T
    eta = jax.random.normal(k2, (periods, k)) @ jnp.linalg.cholesky(H).T

    def step(x, inputs):
        e, m = inputs
        x_next = T @ x + R @ e
        return x_next, Z @ x_next + m

    _, y = jax.lax.scan(step, jnp.zeros(n), (eps, eta))
    return y


@pytest.fixture(scope="module")
def linear_ss():
    key = jax.random.PRNGKey(0)
    T, R, Z, Q, H = _random_linear_ss(key)
    y = _simulate(jax.random.PRNGKey(1), T, R, Z, Q, H)
    return T, R, Z, Q, H, y


def test_ukf_matches_kalman_on_linear_model(linear_ss):
    T, R, Z, Q, H, y = linear_ss
    n = T.shape[0]
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    kf = kalman_filter(y, T, R, Q, Z, H, x0=jnp.zeros(n), P0=P0)

    res = ukf_loglik(y, lambda x, e: T @ x + R @ e, lambda x: Z @ x,
                     Q, H, jnp.zeros(n), P0)
    assert bool(res.success)
    np.testing.assert_allclose(float(res.loglik), float(kf.loglik),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res.loglik_t),
                               np.asarray(kf.loglik_t), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.filtered_mean),
                               np.asarray(kf.filtered_mean),
                               rtol=1e-6, atol=1e-8)


def test_ukf_matches_kalman_with_missing_data(linear_ss):
    T, R, Z, Q, H, y = linear_ss
    n = T.shape[0]
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    y = np.asarray(y).copy()
    y[5:15, 0] = np.nan          # one series missing for a stretch
    y[30, :] = np.nan            # a fully missing period
    y = jnp.asarray(y)
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    kf = kalman_filter(y, T, R, Q, Z, H, x0=jnp.zeros(n), P0=P0)
    res = ukf_loglik(y, lambda x, e: T @ x + R @ e, lambda x: Z @ x,
                     Q, H, jnp.zeros(n), P0)
    assert bool(res.success)
    np.testing.assert_allclose(float(res.loglik), float(kf.loglik),
                               rtol=1e-8)


def test_ukf_nonstandard_weights_still_exact_linear(linear_ss):
    """Linear exactness must hold for any (alpha, beta, kappa)."""
    T, R, Z, Q, H, y = linear_ss
    n = T.shape[0]
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    kf = kalman_filter(y, T, R, Q, Z, H, x0=jnp.zeros(n), P0=P0)
    res = ukf_loglik(y, lambda x, e: T @ x + R @ e, lambda x: Z @ x,
                     Q, H, jnp.zeros(n), P0, alpha=0.9, beta=2.0, kappa=1.0)
    np.testing.assert_allclose(float(res.loglik), float(kf.loglik),
                               rtol=1e-7)


def test_ukf_is_differentiable(linear_ss):
    T, R, Z, Q, H, y = linear_ss
    n = T.shape[0]
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)

    def loss(scale):
        res = ukf_loglik(y, lambda x, e: scale * (T @ x) + R @ e,
                         lambda x: Z @ x, Q, H, jnp.zeros(n), P0)
        return res.loglik

    g = jax.grad(loss)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
    # finite-difference check
    h = 1e-6
    fd = (float(loss(jnp.asarray(1.0 + h))) -
          float(loss(jnp.asarray(1.0 - h)))) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=2e-4)


def test_ukf_tracks_quadratic_mean_shift():
    """Scalar model  x' = t x + 0.5 g (x^2 + e^2 - moments) + e : the UKF
    must track the quadratic term's contribution to the predicted mean
    (E[x'^2] terms), which a linear filter ignores entirely.  Pin the
    one-step predicted mean against the closed form."""
    t, g = 0.5, 0.4
    Q = jnp.array([[0.25]])
    H = jnp.array([[1e-4]])
    Z = jnp.eye(1)

    def trans(x, e):
        return t * x + 0.5 * g * (x * x + e * e) + e

    # prior x ~ N(m0, P0): predicted mean = t m0 + 0.5 g (m0^2 + P0 + Q)
    m0, P0 = jnp.array([0.3]), jnp.array([[0.09]])
    pred_mean = t * 0.3 + 0.5 * g * (0.3**2 + 0.09 + 0.25)
    # a single observation with tiny noise pins the filtered mean at y;
    # use y = NaN so the filtered mean IS the predicted mean
    y = jnp.array([[np.nan]])
    res = ukf_loglik(y, trans, lambda x: Z @ x, Q, H, m0, P0)
    np.testing.assert_allclose(float(res.filtered_mean[0, 0]), pred_mean,
                               rtol=1e-10)


def test_ukf_flags_nonfinite():
    """An explosive transition must flip success, not raise."""
    Q = jnp.eye(1) * 0.01
    H = jnp.eye(1) * 0.01
    y = jnp.ones((20, 1))

    def trans(x, e):
        return jnp.exp(x * 500.0) + e     # e^2500 overflows even float64

    res = ukf_loglik(y, trans, lambda x: x, Q, H,
                     jnp.array([5.0]), jnp.eye(1))
    assert not bool(res.success)


def test_ukf_smoother_matches_rts_on_linear_model(linear_ss):
    """On a linear model the unscented RTS smoother must reproduce the
    Kalman smoother."""
    from geconpy_tpu.ops.kalman import kalman_smoother
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov
    from geconpy_tpu.ops.ukf import ukf_smoother

    T, R, Z, Q, H, y = linear_ss
    n = T.shape[0]
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    ks = kalman_smoother(y, T, R, Q, Z, H, x0=jnp.zeros(n), P0=P0)
    us = ukf_smoother(y, lambda x, e: T @ x + R @ e, lambda x: Z @ x,
                      Q, H, jnp.zeros(n), P0)
    assert bool(us.success)
    np.testing.assert_allclose(np.asarray(us.smoothed_mean),
                               np.asarray(ks.smoothed_mean),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(us.smoothed_cov),
                               np.asarray(ks.smoothed_cov),
                               rtol=1e-4, atol=1e-8)


def test_ukf_smoother_reduces_uncertainty(linear_ss):
    """Smoothing can only reduce (or keep) marginal variances vs filtering
    in a well-posed linear model."""
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov
    from geconpy_tpu.ops.ukf import ukf_smoother

    T, R, Z, Q, H, y = linear_ss
    n = T.shape[0]
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    us = ukf_smoother(y, lambda x, e: T @ x + R @ e, lambda x: Z @ x,
                      Q, H, jnp.zeros(n), P0)
    f_var = np.asarray(jax.vmap(jnp.diagonal)(us.filtered_cov))
    s_var = np.asarray(jax.vmap(jnp.diagonal)(us.smoothed_cov))
    assert np.all(s_var <= f_var + 1e-10)
