"""Durbin-Koopman disturbance smoother tests (ops/kalman.py).

The defining property is the exact reconstruction identity: smoothed shocks
replayed through the transition reproduce the smoothed state path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.kalman import (
    disturbance_smoother,
    kalman_smoother,
)


def make_system(seed=0, n=4, k=2, n_shocks=2):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    T = 0.85 * M / np.max(np.abs(np.linalg.eigvals(M)))
    R = rng.normal(size=(n, n_shocks))
    Q = np.diag(rng.uniform(0.5, 1.5, n_shocks) * 0.01)
    Z = rng.normal(size=(k, n))
    H = np.diag(rng.uniform(0.5, 1.5, k) * 0.001)
    d = rng.normal(size=(k,)) * 0.1
    return (jnp.asarray(T), jnp.asarray(R), jnp.asarray(Q),
            jnp.asarray(Z), jnp.asarray(H), jnp.asarray(d))


def simulate(T, R, Q, Z, H, d, periods, seed=1):
    rng = np.random.default_rng(seed)
    n, n_shocks = R.shape
    k = Z.shape[0]
    x = np.zeros(n)
    ys, shocks = [], []
    cq = np.linalg.cholesky(np.asarray(Q))
    ch = np.linalg.cholesky(np.asarray(H))
    for _ in range(periods):
        e = cq @ rng.normal(size=n_shocks)
        x = np.asarray(T) @ x + np.asarray(R) @ e
        ys.append(np.asarray(Z) @ x + np.asarray(d) + ch @ rng.normal(size=k))
        shocks.append(e)
    return np.asarray(ys), np.asarray(shocks)


def test_reconstruction_identity():
    """x_t^s = T x_{t-1}^s + R e_t^s must hold to machine precision."""
    T, R, Q, Z, H, d = make_system()
    y, _ = simulate(T, R, Q, Z, H, d, periods=60)
    dsm = disturbance_smoother(jnp.asarray(y), T, R, Q, Z, H, d=d)
    x_s = np.asarray(dsm.smoothed_mean)
    eps = np.asarray(dsm.shocks)
    recon = (np.asarray(T) @ x_s[:-1].T).T + (np.asarray(R) @ eps[1:].T).T
    np.testing.assert_allclose(x_s[1:], recon, atol=1e-10)


def test_smoothed_states_match_rts():
    T, R, Q, Z, H, d = make_system(seed=5)
    y, _ = simulate(T, R, Q, Z, H, d, periods=50)
    dsm = disturbance_smoother(jnp.asarray(y), T, R, Q, Z, H, d=d)
    rts = kalman_smoother(jnp.asarray(y), T, R, Q, Z, H, d=d)
    np.testing.assert_allclose(np.asarray(dsm.smoothed_mean),
                               np.asarray(rts.smoothed_mean), atol=1e-7)


def test_observation_identity():
    """y_t = Z x_t^s + d + u_t^s on observed entries."""
    T, R, Q, Z, H, d = make_system(seed=7)
    y, _ = simulate(T, R, Q, Z, H, d, periods=40)
    dsm = disturbance_smoother(jnp.asarray(y), T, R, Q, Z, H, d=d)
    fitted = (np.asarray(Z) @ np.asarray(dsm.smoothed_mean).T).T \
        + np.asarray(d) + np.asarray(dsm.obs_noise)
    np.testing.assert_allclose(fitted, y, atol=1e-10)


def test_recovers_true_shocks_under_low_noise():
    """With tiny measurement error and as many observables as shocks, the
    smoothed shocks track the true innovations closely."""
    rng = np.random.default_rng(11)
    n, n_shocks = 3, 2
    M = rng.normal(size=(n, n))
    T = jnp.asarray(0.7 * M / np.max(np.abs(np.linalg.eigvals(M))))
    R = jnp.asarray(rng.normal(size=(n, n_shocks)))
    Q = jnp.asarray(np.diag([0.01, 0.02]))
    Z = jnp.asarray(np.eye(n))           # fully observed states
    H = jnp.asarray(1e-10 * np.eye(n))
    d = jnp.zeros(3)
    y, true_shocks = simulate(T, R, Q, Z, H, d, periods=80, seed=2)
    dsm = disturbance_smoother(jnp.asarray(y), T, R, Q, Z, H, d=d)
    eps = np.asarray(dsm.shocks)
    corr = np.corrcoef(eps[5:, 0], true_shocks[5:, 0])[0, 1]
    assert corr > 0.99, corr
    np.testing.assert_allclose(eps[5:], true_shocks[5:], atol=1e-3)


def test_missing_data_masked():
    T, R, Q, Z, H, d = make_system(seed=13)
    y, _ = simulate(T, R, Q, Z, H, d, periods=40)
    y_nan = y.copy()
    y_nan[::3, 0] = np.nan
    dsm = disturbance_smoother(jnp.asarray(y_nan), T, R, Q, Z, H, d=d)
    assert np.all(np.isfinite(np.asarray(dsm.shocks)))
    # reconstruction identity still holds with gaps
    x_s = np.asarray(dsm.smoothed_mean)
    eps = np.asarray(dsm.shocks)
    recon = (np.asarray(T) @ x_s[:-1].T).T + (np.asarray(R) @ eps[1:].T).T
    np.testing.assert_allclose(x_s[1:], recon, atol=1e-10)
    # masked measurement errors are zero
    assert np.all(np.asarray(dsm.obs_noise)[::3, 0] == 0.0)
