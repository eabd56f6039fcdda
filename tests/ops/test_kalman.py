import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.kalman import kalman_filter, kalman_loglik, kalman_smoother


def make_system(n=3, k=2, seed=0):
    rng = np.random.default_rng(seed)
    T = rng.normal(size=(n, n))
    T = 0.7 * T / np.abs(np.linalg.eigvals(T)).max()
    R = np.eye(n)[:, :n]
    Q = 0.05 * np.eye(n)
    Z = rng.normal(size=(k, n))
    H = 0.01 * np.eye(k)
    return T, R, Q, Z, H


def simulate_data(T, R, Q, Z, H, periods=200, seed=1):
    rng = np.random.default_rng(seed)
    n = T.shape[0]
    k = Z.shape[0]
    cq = np.linalg.cholesky(Q)
    ch = np.linalg.cholesky(H)
    x = np.zeros(n)
    ys, xs = [], []
    for _ in range(periods):
        x = T @ x + R @ (cq @ rng.normal(size=n))
        y = Z @ x + ch @ rng.normal(size=k)
        xs.append(x)
        ys.append(y)
    return np.array(ys), np.array(xs)


def numpy_kalman_loglik(y, T, R, Q, Z, H, x0, P0):
    """Straightforward textbook implementation as an oracle."""
    n = T.shape[0]
    x, P = x0.copy(), P0.copy()
    ll = 0.0
    for t in range(y.shape[0]):
        x = T @ x
        P = T @ P @ T.T + R @ Q @ R.T
        obs = np.isfinite(y[t])
        if obs.any():
            Zo = Z[obs]
            Ho = H[np.ix_(obs, obs)]
            v = y[t][obs] - Zo @ x
            F = Zo @ P @ Zo.T + Ho
            Fi = np.linalg.inv(F)
            ll += -0.5 * (obs.sum() * np.log(2 * np.pi)
                          + np.linalg.slogdet(F)[1] + v @ Fi @ v)
            K = P @ Zo.T @ Fi
            x = x + K @ v
            P = P - K @ Zo @ P
    return ll


@pytest.fixture(scope="module")
def system():
    T, R, Q, Z, H = make_system()
    y, x_true = simulate_data(T, R, Q, Z, H)
    from scipy.linalg import solve_discrete_lyapunov

    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    x0 = np.zeros(T.shape[0])
    return T, R, Q, Z, H, y, x_true, x0, P0


def test_loglik_matches_numpy_oracle(system):
    T, R, Q, Z, H, y, _, x0, P0 = system
    ll_jax = float(kalman_filter(y, T, R, Q, Z, H, x0=x0, P0=P0).loglik)
    ll_np = numpy_kalman_loglik(y, T, R, Q, Z, H, x0, P0)
    np.testing.assert_allclose(ll_jax, ll_np, rtol=1e-10)


def test_loglik_with_missing_data(system):
    T, R, Q, Z, H, y, _, x0, P0 = system
    y_miss = y.copy()
    y_miss[10:20, 0] = np.nan      # partial missingness
    y_miss[50:55, :] = np.nan      # fully missing periods
    ll_jax = float(kalman_filter(y_miss, T, R, Q, Z, H, x0=x0, P0=P0).loglik)
    ll_np = numpy_kalman_loglik(y_miss, T, R, Q, Z, H, x0, P0)
    np.testing.assert_allclose(ll_jax, ll_np, rtol=1e-10)


def test_default_stationary_init(system):
    T, R, Q, Z, H, y, _, x0, P0 = system
    ll_explicit = float(kalman_filter(y, T, R, Q, Z, H, x0=x0, P0=P0).loglik)
    ll_default = float(kalman_filter(y, T, R, Q, Z, H).loglik)
    np.testing.assert_allclose(ll_default, ll_explicit, rtol=1e-9)


def test_filter_tracks_states(system):
    T, R, Q, Z, H, y, x_true, x0, P0 = system
    res = kalman_filter(y, T, R, Q, Z, H, x0=x0, P0=P0)
    filt = np.asarray(res.filtered_mean)
    # filtered estimates correlate with the truth (state 1 is only weakly
    # observed through 2 observables, so require a strong average)
    corrs = [np.corrcoef(filt[:, i], x_true[:, i])[0, 1]
             for i in range(T.shape[0])]
    assert min(corrs) > 0.5, corrs
    assert np.mean(corrs) > 0.8, corrs


def test_smoother_improves_on_filter(system):
    T, R, Q, Z, H, y, x_true, x0, P0 = system
    res_f = kalman_filter(y, T, R, Q, Z, H, x0=x0, P0=P0)
    res_s = kalman_smoother(y, T, R, Q, Z, H, x0=x0, P0=P0)
    mse_f = np.mean((np.asarray(res_f.filtered_mean) - x_true) ** 2)
    mse_s = np.mean((np.asarray(res_s.smoothed_mean) - x_true) ** 2)
    assert mse_s < mse_f


def test_loglik_grad_and_vmap(system):
    T, R, Q, Z, H, y, _, x0, P0 = system

    def ll(scale):
        return kalman_loglik(y, T * scale, R, Q, Z, H, x0=x0, P0=P0)

    g = jax.grad(ll)(1.0)
    assert np.isfinite(float(g))

    scales = jnp.array([0.9, 1.0, 1.05])
    lls = jax.vmap(ll)(scales)
    assert lls.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(lls)))
    # true scale (1.0) should beat badly wrong scales
    assert float(lls[1]) > float(lls[0])


def test_nonfinite_becomes_neg_inf(system):
    T, R, Q, Z, H, y, _, x0, P0 = system
    bad_T = jnp.asarray(T) * jnp.nan
    ll = kalman_loglik(y, bad_T, R, Q, Z, H, x0=x0, P0=P0)
    assert float(ll) == -np.inf


def test_smoother_float32_rank_deficient():
    """The RTS gain solve must survive float32 with fewer shocks than
    states (rank-deficient predicted covariance): the ridge is dtype-aware
    (success_tol), not a fixed 1e-9 that float32 cannot see."""
    rng = np.random.default_rng(5)
    n, k, m = 6, 2, 1           # 6 states, 1 shock: P_pred rank-deficient
    T = rng.normal(size=(n, n))
    T = 0.9 * T / np.abs(np.linalg.eigvals(T)).max()
    R = rng.normal(size=(n, m))
    Q = np.array([[0.01]])
    Z = rng.normal(size=(k, n))
    H = 1e-4 * np.eye(k)

    x = np.zeros(n)
    ys = []
    for _ in range(120):
        x = T @ x + R[:, 0] * (0.1 * rng.normal())
        ys.append(Z @ x + 1e-2 * rng.normal(size=k))
    y32 = jnp.asarray(np.array(ys), dtype=jnp.float32)

    args32 = [jnp.asarray(a, dtype=jnp.float32) for a in (T, R, Q, Z, H)]
    sm = kalman_smoother(y32, *args32)
    assert sm.smoothed_mean.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(sm.smoothed_mean)))
    assert bool(jnp.all(jnp.isfinite(sm.smoothed_cov)))

    # and it should still agree with the float64 smoother to f32 precision
    args64 = [jnp.asarray(a, dtype=jnp.float64) for a in (T, R, Q, Z, H)]
    sm64 = kalman_smoother(jnp.asarray(np.array(ys)), *args64)
    np.testing.assert_allclose(np.asarray(sm.smoothed_mean),
                               np.asarray(sm64.smoothed_mean),
                               atol=5e-3, rtol=5e-2)
