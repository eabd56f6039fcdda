"""Particle filter oracle tests: on a linear Gaussian model the bootstrap
filter's log marginal likelihood must agree with the exact Kalman value
within Monte-Carlo error."""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.ops.kalman import kalman_filter
from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov
from geconpy_tpu.ops.particle_filter import (particle_filter_loglik,
                                             systematic_resample)


def _linear_setup(key, n=3, q=2, k=2, periods=50):
    kT, kR, kZ, ksim, keta = jax.random.split(key, 5)
    A = jax.random.normal(kT, (n, n)) * 0.3
    T = jnp.real(0.7 * A / jnp.maximum(
        1.0, jnp.max(jnp.abs(jnp.linalg.eigvals(A)))))
    R = jax.random.normal(kR, (n, q)) * 0.5
    Z = jax.random.normal(kZ, (k, n))
    Q = jnp.diag(jnp.array([0.04, 0.09]))
    H = jnp.eye(k) * 0.05

    eps = jax.random.normal(ksim, (periods, q)) @ jnp.linalg.cholesky(Q).T
    eta = jax.random.normal(keta, (periods, k)) @ jnp.linalg.cholesky(H).T

    def step(x, inp):
        e, m = inp
        x_next = T @ x + R @ e
        return x_next, Z @ x_next + m

    _, y = jax.lax.scan(step, jnp.zeros(n), (eps, eta))
    return T, R, Z, Q, H, y


def test_systematic_resample_preserves_mean():
    key = jax.random.PRNGKey(0)
    parts = jax.random.normal(key, (4096, 2)) + jnp.array([1.0, -2.0])
    log_w = jax.random.normal(jax.random.PRNGKey(1), (4096,)) * 0.3
    res = systematic_resample(jax.random.PRNGKey(2), log_w, parts)
    w = jax.nn.softmax(log_w)
    np.testing.assert_allclose(np.asarray(res.mean(0)),
                               np.asarray(w @ parts), atol=0.05)


def test_pf_matches_kalman_on_linear_model():
    T, R, Z, Q, H, y = _linear_setup(jax.random.PRNGKey(3))
    n = T.shape[0]
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    kf_ll = float(kalman_filter(y, T, R, Q, Z, H,
                                x0=jnp.zeros(n), P0=P0).loglik)

    n_particles = 8192
    init = jax.random.multivariate_normal(
        jax.random.PRNGKey(4), jnp.zeros(n), P0, (n_particles,))

    def run(seed):
        res = particle_filter_loglik(
            jax.random.PRNGKey(seed), y, init,
            lambda x, e: T @ x + R @ e, lambda x: Z @ x, Q, H)
        assert bool(res.success)
        return float(res.loglik)

    lls = np.array([run(s) for s in range(5)])
    # unbiased in levels; at 8k particles the log estimate is tight
    assert abs(lls.mean() - kf_ll) < 0.5, (lls, kf_ll)
    assert lls.std() < 0.5


def test_pf_missing_data_matches_kalman():
    T, R, Z, Q, H, y = _linear_setup(jax.random.PRNGKey(5))
    n = T.shape[0]
    y = np.asarray(y).copy()
    y[10:20, 0] = np.nan
    y[25, :] = np.nan
    y = jnp.asarray(y)
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    kf_ll = float(kalman_filter(y, T, R, Q, Z, H,
                                x0=jnp.zeros(n), P0=P0).loglik)
    init = jax.random.multivariate_normal(
        jax.random.PRNGKey(6), jnp.zeros(n), P0, (8192,))
    res = particle_filter_loglik(
        jax.random.PRNGKey(7), y, init,
        lambda x, e: T @ x + R @ e, lambda x: Z @ x, Q, H)
    assert bool(res.success)
    assert abs(float(res.loglik) - kf_ll) < 0.6


def test_pf_ess_reported_and_bounded():
    T, R, Z, Q, H, y = _linear_setup(jax.random.PRNGKey(8), periods=20)
    n = T.shape[0]
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    init = jax.random.multivariate_normal(
        jax.random.PRNGKey(9), jnp.zeros(n), P0, (1024,))
    res = particle_filter_loglik(
        jax.random.PRNGKey(10), y, init,
        lambda x, e: T @ x + R @ e, lambda x: Z @ x, Q, H)
    ess = np.asarray(res.ess_t)
    assert np.all(ess >= 1.0 - 1e-9) and np.all(ess <= 1024 + 1e-6)


def test_pf_flags_nonfinite():
    Q = jnp.eye(1) * 0.01
    H = jnp.eye(1) * 0.01
    y = jnp.ones((10, 1))
    init = jnp.full((256, 1), 5.0)

    res = particle_filter_loglik(
        jax.random.PRNGKey(0), y, init,
        lambda x, e: jnp.exp(x * 80.0) + e, lambda x: x, Q, H)
    assert not bool(res.success)
