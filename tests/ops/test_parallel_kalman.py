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


def test_steady_state_filter_matches_exact():
    from geconpy_tpu.ops.kalman import steady_state_kalman_loglik

    T, R, Q, Z, H, d = make_system(seed=8)
    y = simulate(T, R, Q, Z, H, d, 300, seed=9)
    exact = float(kalman_filter(y, T, R, Q, Z, H, d=jnp.asarray(d)).loglik)
    fast = float(steady_state_kalman_loglik(y, T, R, Q, Z, H,
                                            d=jnp.asarray(d), n_settle=60))
    np.testing.assert_allclose(fast, exact, rtol=1e-8)
    # short settle is less exact but close
    fast20 = float(steady_state_kalman_loglik(y, T, R, Q, Z, H,
                                              d=jnp.asarray(d), n_settle=20))
    np.testing.assert_allclose(fast20, exact, rtol=1e-4)
    # degenerate: settle >= periods reduces to the exact filter
    short = simulate(T, R, Q, Z, H, d, 30, seed=10)
    exact_s = float(kalman_filter(short, T, R, Q, Z, H, d=jnp.asarray(d)).loglik)
    fast_s = float(steady_state_kalman_loglik(short, T, R, Q, Z, H,
                                              d=jnp.asarray(d), n_settle=60))
    np.testing.assert_allclose(fast_s, exact_s, rtol=1e-12)


def test_statespace_steady_state_filter_option():
    import pathlib

    import jax

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    data_dir = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(data_dir / "rbc_estimation.gcn"))
    kwargs = dict(observed_states=["Y"], constant_params=["alpha", "sigma_C"])
    ss_seq = DSGEStateSpace(model).configure(**kwargs)
    ss_fast = DSGEStateSpace(model).configure(filter_type="steady_state",
                                              **kwargs)
    data, draw = ss_seq.data_from_prior(jax.random.PRNGKey(0), periods=200)
    u = ss_seq.unconstrain(draw)
    ll_seq = float(jax.jit(ss_seq.build_logpost(data))(u))
    ll_fast = float(jax.jit(ss_fast.build_logpost(data))(u))
    np.testing.assert_allclose(ll_fast, ll_seq, rtol=1e-7)

    # NaN data must be rejected for the fast path
    bad = np.asarray(data).copy()
    bad[3, 0] = np.nan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fully observed"):
        ss_fast.build_logpost(bad)


def test_chandrasekhar_exact_and_differentiable():
    from geconpy_tpu.ops.chandrasekhar import chandrasekhar_loglik

    T, R, Q, Z, H, d = make_system(seed=11)
    y = simulate(T, R, Q, Z, H, d, 150, seed=12)
    exact = float(kalman_filter(y, T, R, Q, Z, H, d=jnp.asarray(d)).loglik)
    fast = float(chandrasekhar_loglik(y, T, R, Q, Z, H, d=jnp.asarray(d)))
    np.testing.assert_allclose(fast, exact, rtol=1e-12)

    g1 = float(jax.grad(lambda s: kalman_filter(
        y, jnp.asarray(T) * s, R, Q, Z, H, d=jnp.asarray(d)).loglik)(1.0))
    g2 = float(jax.grad(lambda s: chandrasekhar_loglik(
        y, jnp.asarray(T) * s, R, Q, Z, H, d=jnp.asarray(d)))(1.0))
    np.testing.assert_allclose(g2, g1, rtol=1e-8)

    # vmap over draws
    lls = jax.vmap(lambda s: chandrasekhar_loglik(
        y, jnp.asarray(T) * s, R, Q, Z, H, d=jnp.asarray(d)))(
        jnp.array([0.95, 1.0]))
    assert bool(jnp.all(jnp.isfinite(lls)))


def test_statespace_chandrasekhar_option():
    import pathlib

    import jax as _jax

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    data_dir = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(data_dir / "rbc_estimation.gcn"))
    kwargs = dict(observed_states=["Y"], constant_params=["alpha", "sigma_C"])
    ss_seq = DSGEStateSpace(model).configure(**kwargs)
    ss_ch = DSGEStateSpace(model).configure(filter_type="chandrasekhar",
                                            **kwargs)
    data, draw = ss_seq.data_from_prior(_jax.random.PRNGKey(0), periods=150)
    u = ss_seq.unconstrain(draw)
    ll_seq = float(_jax.jit(ss_seq.build_logpost(data))(u))
    ll_ch = float(_jax.jit(ss_ch.build_logpost(data))(u))
    np.testing.assert_allclose(ll_ch, ll_seq, rtol=1e-10)
    # gradient flows (exact, so NUTS can use it)
    g = _jax.jit(_jax.grad(ss_ch.build_logpost(data)))(u)
    assert np.all(np.isfinite(np.asarray(g)))
