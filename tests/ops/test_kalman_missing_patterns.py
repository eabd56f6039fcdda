"""Missing-data pattern matrix for the Kalman layer.

The reference exercises its masked filter through pymc_extras across many
missingness shapes; these tests pin each structurally distinct pattern
against first-principles oracles: a leading-NaN block must equal starting
the filter later (with extra predict steps), an all-NaN row must equal one
pure prediction step, a fully-missing series must equal dropping its row
from the design matrix, and the per-period contributions must decompose the
total exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.ops.kalman import (
    disturbance_smoother,
    kalman_filter,
    kalman_loglik,
)


def _system(seed=0, n=5, k=3, m=3):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    T = 0.8 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, m)) / np.sqrt(m)
    Q = jnp.diag(0.05 + jax.random.uniform(k3, (m,)))
    Z = jax.random.normal(k4, (k, n)) / np.sqrt(n)
    H = jnp.diag(0.02 + 0.05 * jax.random.uniform(k5, (k,)))
    return T, R, Q, Z, H


def _simulate(T, R, Q, Z, H, periods, seed=1):
    rng = np.random.default_rng(seed)
    n, m = R.shape
    k = Z.shape[0]
    x = np.zeros(n)
    cq = np.linalg.cholesky(np.asarray(Q))
    ch = np.linalg.cholesky(np.asarray(H))
    ys = []
    for _ in range(periods):
        x = np.asarray(T) @ x + np.asarray(R) @ (cq @ rng.normal(size=m))
        ys.append(np.asarray(Z) @ x + ch @ rng.normal(size=k))
    return np.asarray(ys)


def test_all_nan_row_equals_pure_prediction():
    """A fully-missing period contributes zero log-likelihood and one extra
    predict step: filtering [y1, NaN, y2] must equal filtering y2 with the
    state predicted TWICE from the y1 posterior."""
    T, R, Q, Z, H = _system()
    y = _simulate(T, R, Q, Z, H, 3)
    y_gap = y.copy()
    y_gap[1] = np.nan

    res = kalman_filter(jnp.asarray(y_gap), T, R, Q, Z, H)
    assert float(res.loglik_t[1]) == 0.0

    res_head = kalman_filter(jnp.asarray(y[:1]), T, R, Q, Z, H)
    RQR = R @ Q @ R.T
    x1 = T @ res_head.filtered_mean[0]
    P1 = T @ res_head.filtered_cov[0] @ T.T + RQR
    x2 = T @ x1
    P2 = T @ P1 @ T.T + RQR
    res_tail = kalman_filter(jnp.asarray(y[2:3]), T, R, Q, Z, H,
                             x0=jnp.zeros(T.shape[0]), P0=None)
    # run the last step manually through the same filter seeded at (x2, P2):
    # kalman_filter predicts first, so seed with the pre-predict state
    ll_manual = kalman_loglik(jnp.asarray(y[2:3]), jnp.eye(T.shape[0]),
                              jnp.zeros_like(R), Q * 0.0, Z, H,
                              x0=x2, P0=P2)
    del res_tail
    np.testing.assert_allclose(
        float(res.loglik), float(res_head.loglik) + float(ll_manual),
        rtol=1e-10)


def test_leading_nan_block_equals_diffuse_start_with_predicts():
    """NaN-padding the first s periods equals running the filter on the
    tail with the initial covariance propagated s extra steps."""
    T, R, Q, Z, H = _system(seed=2)
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    y = _simulate(T, R, Q, Z, H, 10, seed=3)
    s = 4
    y_pad = np.vstack([np.full((s, y.shape[1]), np.nan), y])
    RQR = R @ Q @ R.T
    P0 = solve_discrete_lyapunov(T, RQR)
    ll_pad = kalman_loglik(jnp.asarray(y_pad), T, R, Q, Z, H, P0=P0)
    # stationary P0 is invariant under extra predicts; mean stays zero
    ll_tail = kalman_loglik(jnp.asarray(y), T, R, Q, Z, H, P0=P0)
    np.testing.assert_allclose(float(ll_pad), float(ll_tail), rtol=1e-10)


def test_fully_missing_series_equals_dropped_row():
    """A series that is NaN everywhere must contribute exactly nothing:
    the loglik equals the filter with that row deleted from Z/H/d."""
    T, R, Q, Z, H = _system(seed=4)
    y = _simulate(T, R, Q, Z, H, 20, seed=5)
    y_miss = y.copy()
    y_miss[:, 1] = np.nan
    ll_masked = kalman_loglik(jnp.asarray(y_miss), T, R, Q, Z, H)
    keep = np.array([0, 2])
    ll_dropped = kalman_loglik(jnp.asarray(y[:, keep]), T, R, Q,
                               Z[keep], H[np.ix_(keep, keep)])
    np.testing.assert_allclose(float(ll_masked), float(ll_dropped),
                               rtol=1e-10)


def test_loglik_decomposes_and_first_period_is_gaussian_marginal():
    T, R, Q, Z, H = _system(seed=6)
    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    y = _simulate(T, R, Q, Z, H, 15, seed=7)
    P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    res = kalman_filter(jnp.asarray(y), T, R, Q, Z, H, P0=P0)
    np.testing.assert_allclose(float(res.loglik),
                               float(jnp.sum(res.loglik_t)), rtol=1e-12)
    # first-period marginal: y1 ~ N(0, Z P1 Z' + H) with P1 = T P0 T' + RQR
    import scipy.stats as sps

    P1 = np.asarray(T @ P0 @ T.T + R @ Q @ R.T)
    S = np.asarray(Z) @ P1 @ np.asarray(Z).T + np.asarray(H)
    ll1 = sps.multivariate_normal(np.zeros(y.shape[1]), S).logpdf(y[0])
    np.testing.assert_allclose(float(res.loglik_t[0]), ll1, rtol=1e-9)


def test_random_missingness_matches_numpy_oracle():
    """Arbitrary NaN scatter against a dense numpy masked-filter oracle."""
    T, R, Q, Z, H = _system(seed=8)
    periods = 25
    y = _simulate(T, R, Q, Z, H, periods, seed=9)
    rng = np.random.default_rng(10)
    mask = rng.random(y.shape) > 0.3
    mask[0] = True                          # keep the first row observed
    y_nan = np.where(mask, y, np.nan)

    from geconpy_tpu.ops.lyapunov import solve_discrete_lyapunov

    RQR = np.asarray(R @ Q @ R.T)
    P = np.asarray(solve_discrete_lyapunov(T, jnp.asarray(RQR)))
    Tn, Zn, Hn = np.asarray(T), np.asarray(Z), np.asarray(H)
    x = np.zeros(Tn.shape[0])
    ll = 0.0
    for t in range(periods):
        x = Tn @ x
        P = Tn @ P @ Tn.T + RQR
        obs = mask[t]
        if obs.any():
            Zo = Zn[obs]
            Ho = Hn[np.ix_(obs, obs)]
            v = y[t, obs] - Zo @ x
            S = Zo @ P @ Zo.T + Ho
            Si = np.linalg.inv(S)
            K = P @ Zo.T @ Si
            ll += -0.5 * (obs.sum() * np.log(2 * np.pi)
                          + np.linalg.slogdet(S)[1] + v @ Si @ v)
            x = x + K @ v
            P = P - K @ Zo @ P
    got = kalman_loglik(jnp.asarray(y_nan), T, R, Q, Z, H)
    np.testing.assert_allclose(float(got), ll, rtol=1e-9)


def test_disturbance_smoother_reconstructs_under_missingness():
    """The smoothed shocks/noise satisfy the exact reconstruction identities
    on every OBSERVED entry even with scattered NaNs."""
    T, R, Q, Z, H = _system(seed=11)
    periods = 18
    y = _simulate(T, R, Q, Z, H, periods, seed=12)
    rng = np.random.default_rng(13)
    y_nan = np.where(rng.random(y.shape) > 0.25, y, np.nan)

    res = disturbance_smoother(jnp.asarray(y_nan), T, R, Q, Z, H)
    xs = np.asarray(res.smoothed_mean)
    es = np.asarray(res.shocks)
    us = np.asarray(res.obs_noise)
    # state transition identity for t >= 1
    for t in range(1, periods):
        np.testing.assert_allclose(
            xs[t], np.asarray(T) @ xs[t - 1] + np.asarray(R) @ es[t],
            atol=1e-8)
    # observation identity on observed entries only
    fitted = xs @ np.asarray(Z).T + us
    obs = np.isfinite(y_nan)
    np.testing.assert_allclose(fitted[obs], y_nan[obs], atol=1e-8)


def test_independent_blocks_loglik_adds():
    """Two structurally independent state-space blocks filtered jointly must
    give the sum of their separate log-likelihoods."""
    T1, R1, Q1, Z1, H1 = _system(seed=14, n=3, k=2, m=2)
    T2, R2, Q2, Z2, H2 = _system(seed=15, n=4, k=2, m=2)
    import scipy.linalg as sla

    T = jnp.asarray(sla.block_diag(np.asarray(T1), np.asarray(T2)))
    R = jnp.asarray(sla.block_diag(np.asarray(R1), np.asarray(R2)))
    Q = jnp.asarray(sla.block_diag(np.asarray(Q1), np.asarray(Q2)))
    Z = jnp.asarray(sla.block_diag(np.asarray(Z1), np.asarray(Z2)))
    H = jnp.asarray(sla.block_diag(np.asarray(H1), np.asarray(H2)))
    y1 = _simulate(T1, R1, Q1, Z1, H1, 20, seed=16)
    y2 = _simulate(T2, R2, Q2, Z2, H2, 20, seed=17)
    y = np.hstack([y1, y2])
    ll_joint = kalman_loglik(jnp.asarray(y), T, R, Q, Z, H)
    ll_sep = (kalman_loglik(jnp.asarray(y1), T1, R1, Q1, Z1, H1)
              + kalman_loglik(jnp.asarray(y2), T2, R2, Q2, Z2, H2))
    np.testing.assert_allclose(float(ll_joint), float(ll_sep), rtol=1e-9)


def test_missingness_gradient_matches_finite_differences():
    """Gradients flow correctly through the masked filter (masked rows must
    contribute exactly zero sensitivity)."""
    T, R, Q, Z, H = _system(seed=18)
    y = _simulate(T, R, Q, Z, H, 12, seed=19)
    y_nan = y.copy()
    y_nan[3] = np.nan
    y_nan[7, 0] = np.nan
    y_nan = jnp.asarray(y_nan)

    def loss(scale):
        return kalman_loglik(y_nan, T * scale, R, Q, Z, H)

    g = jax.grad(loss)(jnp.asarray(1.0))
    eps = 1e-6
    fd = (loss(jnp.asarray(1.0 + eps)) - loss(jnp.asarray(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-5)
