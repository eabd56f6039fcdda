"""Parallel (associative-scan) Kalman filter vs the sequential kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.kalman import kalman_filter
from geconpy_tpu.ops.parallel_kalman import parallel_kalman_filter


def make_system(n=5, k=2, n_shocks=3, seed=0):
    rng = np.random.default_rng(seed)
    T = rng.normal(size=(n, n))
    T = 0.75 * T / np.abs(np.linalg.eigvals(T)).max()
    R = rng.normal(size=(n, n_shocks))
    Q = 0.05 * np.eye(n_shocks)
    Z = rng.normal(size=(k, n))
    H = 0.01 * np.eye(k)
    d = 0.1 * rng.normal(size=k)
    return T, R, Q, Z, H, d


def simulate(T, R, Q, Z, H, d, periods, seed=1):
    rng = np.random.default_rng(seed)
    n = T.shape[0]
    cq = np.linalg.cholesky(R @ Q @ R.T + 1e-12 * np.eye(n))
    ch = np.linalg.cholesky(H)
    x = np.zeros(n)
    ys = []
    for _ in range(periods):
        x = T @ x + cq @ rng.normal(size=n)
        ys.append(Z @ x + d + ch @ rng.normal(size=Z.shape[0]))
    return np.array(ys)


@pytest.mark.parametrize("periods", [1, 2, 7, 64, 100])
def test_matches_sequential(periods):
    T, R, Q, Z, H, d = make_system()
    y = simulate(T, R, Q, Z, H, d, periods)
    seq = kalman_filter(y, T, R, Q, Z, H, d=jnp.asarray(d))
    par = parallel_kalman_filter(y, T, R, Q, Z, H, d=jnp.asarray(d))
    np.testing.assert_allclose(float(par.loglik), float(seq.loglik),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(par.filtered_mean),
                               np.asarray(seq.filtered_mean), atol=1e-9)
    np.testing.assert_allclose(np.asarray(par.filtered_cov),
                               np.asarray(seq.filtered_cov), atol=1e-9)


def test_matches_with_missing_data():
    T, R, Q, Z, H, d = make_system(seed=3)
    y = simulate(T, R, Q, Z, H, d, 90, seed=4)
    y[5:9, 0] = np.nan
    y[30, :] = np.nan
    y[-1, 1] = np.nan
    seq = kalman_filter(y, T, R, Q, Z, H, d=jnp.asarray(d))
    par = parallel_kalman_filter(y, T, R, Q, Z, H, d=jnp.asarray(d))
    np.testing.assert_allclose(float(par.loglik), float(seq.loglik),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(par.filtered_mean),
                               np.asarray(seq.filtered_mean), atol=1e-9)


def test_grad_and_vmap():
    T, R, Q, Z, H, d = make_system(seed=5)
    y = simulate(T, R, Q, Z, H, d, 50, seed=6)

    def ll(scale):
        return parallel_kalman_filter(y, jnp.asarray(T) * scale, R, Q, Z, H,
                                      d=jnp.asarray(d)).loglik

    g = jax.grad(ll)(1.0)
    assert np.isfinite(float(g))
    # matches sequential gradient
    g_seq = jax.grad(lambda s: kalman_filter(
        y, jnp.asarray(T) * s, R, Q, Z, H, d=jnp.asarray(d)).loglik)(1.0)
    np.testing.assert_allclose(float(g), float(g_seq), rtol=1e-6)

    lls = jax.vmap(ll)(jnp.array([0.95, 1.0, 1.05]))
    assert bool(jnp.all(jnp.isfinite(lls)))


def test_statespace_parallel_filter_option():
    import pathlib

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    data_dir = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(data_dir / "rbc_estimation.gcn"))
    kwargs = dict(observed_states=["Y"], constant_params=["alpha", "sigma_C"])
    ss_seq = DSGEStateSpace(model).configure(**kwargs)
    ss_par = DSGEStateSpace(model).configure(filter_type="parallel", **kwargs)
    data, draw = ss_seq.data_from_prior(jax.random.PRNGKey(0), periods=120)
    u = ss_seq.unconstrain(draw)
    ll_seq = float(jax.jit(ss_seq.build_logpost(data))(u))
    ll_par = float(jax.jit(ss_par.build_logpost(data))(u))
    np.testing.assert_allclose(ll_par, ll_seq, rtol=1e-8)
