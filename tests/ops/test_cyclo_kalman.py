"""Cyclostationary Kalman filter unit tests (ops/cyclo_kalman.py).

The filter freezes per-phase gains at the periodic-DARE cycle; initialized
at the cycle's phase-0 covariance, the exact masked sequential filter stays
on the cycle, so the two log-likelihoods must agree to machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.cyclo_kalman import (
    _cycle_map,
    _masked_dare_step,
    _phase_matrices,
    cyclostationary_kalman_loglik,
    detect_mask_period,
)
from geconpy_tpu.ops.kalman import kalman_filter, stationary_kalman_loglik


def test_detect_mask_period():
    k = 2
    pattern = np.array([[True, False], [True, False], [True, True]])
    mask = np.tile(pattern, (7, 1))[:20]
    assert detect_mask_period(mask) == 3

    full = np.ones((10, k), dtype=bool)
    assert detect_mask_period(full) == 1

    rng = np.random.default_rng(0)
    aperiodic = rng.random((20, k)) > 0.5
    aperiodic[0, 0] = True
    aperiodic[1, 0] = False  # ensure not constant
    assert detect_mask_period(aperiodic, max_period=8) in (None,)


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
    ys = []
    cq = np.linalg.cholesky(np.asarray(Q))
    ch = np.linalg.cholesky(np.asarray(H))
    for _ in range(periods):
        x = np.asarray(T) @ x + np.asarray(R) @ (cq @ rng.normal(size=n_shocks))
        ys.append(np.asarray(Z) @ x + np.asarray(d) + ch @ rng.normal(size=k))
    return np.asarray(ys)


def periodic_fixed_point(T, R, Q, Z, H, pattern, n_cycles=200):
    RQR = R @ Q @ R.T
    _, Z_stack, H_stack = _phase_matrices(Z, H, jnp.asarray(pattern))

    @jax.jit
    def run(P):
        return jax.lax.fori_loop(
            0, n_cycles,
            lambda _, P: _cycle_map(P, T, RQR, Z_stack, H_stack), P)

    return run(RQR)


def seed_covariance_for_exact_filter(T, R, Q, Z, H, pattern, P0_star):
    """kalman_filter's P0 argument is the covariance BEFORE the first predict
    step, while the cycle fixed point P0_star is the PREDICTIVE covariance at
    phase-0 times.  Walk the cycle to the phase-(p-1) predictive covariance
    and apply the measurement update only, so that the filter's first predict
    lands exactly on P0_star."""
    RQR = R @ Q @ R.T
    _, Z_stack, H_stack = _phase_matrices(Z, H, jnp.asarray(pattern))
    p = Z_stack.shape[0]
    P = P0_star
    for j in range(p - 1):
        P = _masked_dare_step(P, T, RQR, Z_stack[j], H_stack[j])
    Z_l, H_l = Z_stack[p - 1], H_stack[p - 1]
    PZt = P @ Z_l.T
    S = Z_l @ PZt + H_l
    K = jnp.linalg.solve(S, PZt.T).T
    P_upd = P - K @ PZt.T
    return 0.5 * (P_upd + P_upd.T)


@pytest.mark.parametrize("p_idx", [0, 1])
def test_matches_exact_filter_started_on_cycle(p_idx):
    patterns = [
        np.array([[True, False], [True, True]]),                  # p = 2
        np.array([[True, False], [True, False], [True, True]]),   # p = 3
    ]
    pattern = patterns[p_idx]
    p = pattern.shape[0]
    T, R, Q, Z, H, d = make_system(seed=3 + p_idx)
    periods = 7 * p + 2   # deliberately not a multiple of p
    y = simulate(T, R, Q, Z, H, d, periods)
    mask = np.tile(pattern, (periods // p + 1, 1))[:periods]
    y_nan = np.where(mask, y, np.nan)

    P0_star = periodic_fixed_point(T, R, Q, Z, H, pattern)
    P0_seed = seed_covariance_for_exact_filter(T, R, Q, Z, H, pattern, P0_star)
    ll_exact = kalman_filter(jnp.asarray(y_nan), T, R, Q, Z, H, d=d,
                             P0=P0_seed).loglik
    ll_cyclo = cyclostationary_kalman_loglik(
        jnp.asarray(y_nan), T, R, Q, Z, H, d=d, mask_pattern=pattern)
    np.testing.assert_allclose(float(ll_cyclo), float(ll_exact), rtol=1e-9)


def test_p1_reduces_to_stationary_filter():
    T, R, Q, Z, H, d = make_system(seed=7)
    y = simulate(T, R, Q, Z, H, d, periods=40)
    ll_stat = stationary_kalman_loglik(jnp.asarray(y), T, R, Q, Z, H, d=d)
    ll_cyclo = cyclostationary_kalman_loglik(
        jnp.asarray(y), T, R, Q, Z, H, d=d,
        mask_pattern=np.ones((1, Z.shape[0]), dtype=bool))
    np.testing.assert_allclose(float(ll_cyclo), float(ll_stat), rtol=1e-9)


def test_gradient_matches_finite_differences():
    pattern = np.array([[True, False], [True, True]])
    T, R, Q, Z, H, d = make_system(seed=11)
    periods = 24
    y = simulate(T, R, Q, Z, H, d, periods)
    mask = np.tile(pattern, (periods // 2, 1))
    y_nan = jnp.asarray(np.where(mask, y, np.nan))

    def loss(theta):
        T_ = T * theta[0]
        Q_ = Q * theta[1] ** 2
        d_ = d + theta[2]
        return cyclostationary_kalman_loglik(
            y_nan, T_, R, Q_, Z, H, d=d_, mask_pattern=pattern)

    theta = jnp.array([0.95, 1.1, 0.02])
    g = jax.grad(loss)(theta)
    eps = 1e-6
    for i in range(3):
        dv = jnp.zeros(3).at[i].set(eps)
        fd = (loss(theta + dv) - loss(theta - dv)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-5,
                                   err_msg=f"theta[{i}]")


def test_vmap_and_jit_over_draws():
    pattern = np.array([[True, False], [True, True]])
    T, R, Q, Z, H, d = make_system(seed=13)
    periods = 30
    y = simulate(T, R, Q, Z, H, d, periods)
    mask = np.tile(pattern, (periods // 2, 1))
    y_nan = jnp.asarray(np.where(mask, y, np.nan))

    scales = jnp.array([0.9, 0.95, 1.0])

    @jax.jit
    @jax.vmap
    def ll(s):
        return cyclostationary_kalman_loglik(
            y_nan, T * s, R, Q, Z, H, d=d, mask_pattern=pattern)

    out = np.asarray(ll(scales))
    assert np.all(np.isfinite(out))
    ref = [float(cyclostationary_kalman_loglik(
        y_nan, T * float(s), R, Q, Z, H, d=d, mask_pattern=pattern))
        for s in scales]
    np.testing.assert_allclose(out, ref, rtol=1e-10)


def test_unstable_undetectable_system_never_nan():
    # unstable AND unobserved (Z = 0): the settle cannot converge, but the
    # filter must degrade to a finite-or--inf value, never NaN (the statespace
    # layer gates unstable draws on the policy `stable` flag before this)
    T, R, Q, Z, H, d = make_system(seed=17)
    T_bad = T * 3.0
    Z_blind = jnp.zeros_like(Z)
    pattern = np.array([[True, True]])
    y = simulate(T, R, Q, Z, H, d, periods=12)
    ll = cyclostationary_kalman_loglik(jnp.asarray(y), T_bad, R, Q, Z_blind,
                                       H, d=d, mask_pattern=pattern)
    assert not np.isnan(float(ll))
    assert float(ll) < 0


def test_unstable_but_detectable_is_finite():
    # the stationary filter STABILIZES a detectable unstable system: the
    # periodic DARE still has a stabilizing solution and the loglik is finite
    T, R, Q, Z, H, d = make_system(seed=17)
    y = simulate(T, R, Q, Z, H, d, periods=12)
    ll = cyclostationary_kalman_loglik(
        jnp.asarray(y), T * 1.2, R, Q, Z, H, d=d,
        mask_pattern=np.array([[True, True]]))
    assert np.isfinite(float(ll))


def test_cyclic_settle_unbiased_tiny_innovations():
    """The SW-2007 settle bug class, periodic-mask edition.  The old cyclic
    settle had TWO silent-bias modes: (a) a FIXED Hewer stage count with no
    convergence check, and (b) a keep-previous-iterate guard on failed
    Lyapunov solves — from a poor start (P = RQR) the derived gain can be
    DEstabilizing even for stable T (measured rho(A_cyc) = 1.18 at
    rho(T) = 0.97), the inner doubling blows up, P freezes, and a zero
    update masquerades as convergence.  The fixed settle (open-loop
    unconditional start + adaptive continuation + Riccati fallback) must
    reach the true periodic fixed point: its frozen-gain likelihood has to
    match the exact masked filter seeded on a brute-force-converged cycle,
    even with the warmup starved to one cycle (n_settle=1)."""
    key = jax.random.PRNGKey(21)
    k1, k2, k3 = jax.random.split(key, 3)
    n, k = 8, 3
    T = 0.97 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, k)) / np.sqrt(k)
    Q = jnp.diag(jnp.asarray([1e-2, 2e-3, 5e-4]) ** 2)
    Z = jax.random.normal(k3, (k, n)) / np.sqrt(n)
    H = jnp.zeros((k, k))          # no measurement error
    d = jnp.zeros((k,))
    pattern = np.array([[True, True, True], [True, False, True]])  # p = 2
    periods = 120
    y = simulate(T, R, Q * 1e-12, Z, jnp.eye(k) * 1e-18, d, periods, seed=22)
    mask = np.tile(pattern, (periods // 2, 1))
    y_nan = jnp.asarray(np.where(mask, y, np.nan))

    # brute-force periodic fixed point + residual sanity
    P_star = periodic_fixed_point(T, R, Q, Z, H, pattern, n_cycles=4000)
    RQR = R @ Q @ R.T
    _, Z_stack, H_stack = _phase_matrices(Z, H, jnp.asarray(pattern))
    resid = float(jnp.max(jnp.abs(
        _cycle_map(P_star, T, RQR, Z_stack, H_stack) - P_star)))
    assert resid < 1e-8 * float(jnp.max(jnp.abs(P_star)))

    P0_seed = seed_covariance_for_exact_filter(T, R, Q, Z, H, pattern, P_star)
    ll_ref = float(kalman_filter(y_nan, T, R, Q, Z, H, d=d,
                                 P0=P0_seed).loglik)
    assert np.isfinite(ll_ref)
    for n_settle in (1, 16):
        ll_cyclo = float(cyclostationary_kalman_loglik(
            y_nan, T, R, Q, Z, H, d=d, mask_pattern=pattern,
            n_settle=n_settle))
        np.testing.assert_allclose(ll_cyclo, ll_ref, rtol=1e-6,
                                   atol=1e-6 * abs(ll_ref),
                                   err_msg=f"n_settle={n_settle}")

    # guard that the fixture actually exercises the bug: the OLD schedule
    # with the same starved warmup (start at RQR, 1 warmup cycle, 8 fixed
    # Hewer stages with the keep-previous freeze) IS badly biased here —
    # if this ever passes, the fixture no longer regresses anything
    from geconpy_tpu.ops.cyclo_kalman import _cycle_closed_loop
    from geconpy_tpu.ops.lyapunov import _doubling

    P_fixed = _cycle_map(RQR, T, RQR, Z_stack, H_stack)
    for _ in range(8):
        A_cyc, G_cyc = _cycle_closed_loop(P_fixed, T, RQR, Z_stack, H_stack)
        P_new = _doubling(A_cyc, G_cyc, 1e-14, 40)
        ok = bool(jnp.all(jnp.isfinite(P_new)))
        if ok:
            P_fixed = 0.5 * (P_new + P_new.T)
    P_seed_fixed = seed_covariance_for_exact_filter(
        T, R, Q, Z, H, pattern, P_fixed)
    ll_fixed = float(kalman_filter(y_nan, T, R, Q, Z, H, d=d,
                                   P0=P_seed_fixed).loglik)
    assert not np.isfinite(ll_fixed) or abs(ll_fixed - ll_ref) > 0.1, (
        "fixture no longer ill-conditioned enough to regress the settle")


def test_cyclic_settle_rejects_nonconvergent_as_neg_inf():
    """A draw whose cyclic settle cannot converge within the stage cap must
    be rejected as -inf (failure = flags, never a silently biased value)."""
    key = jax.random.PRNGKey(33)
    k1, k2, k3 = jax.random.split(key, 3)
    n, k = 8, 3
    T = 0.97 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, k)) / np.sqrt(k)
    # separations of 1e-8+ need more stages than the cap allows (same
    # boundary the stationary settle documents)
    Q = jnp.diag(jnp.asarray([1e-2, 1e-8, 1e-10]) ** 2)
    Z = jax.random.normal(k3, (k, n)) / np.sqrt(n)
    H = jnp.zeros((k, k))
    d = jnp.zeros((k,))
    pattern = np.array([[True, True, True], [True, False, True]])
    periods = 60
    y = simulate(T, R, Q * 1e-12, Z, jnp.eye(k) * 1e-18, d, periods, seed=34)
    mask = np.tile(pattern, (periods // 2, 1))
    y_nan = jnp.asarray(np.where(mask, y, np.nan))
    ll = float(cyclostationary_kalman_loglik(
        y_nan, T, R, Q, Z, H, d=d, mask_pattern=pattern))
    # either the settle genuinely converged (fine) or the draw was rejected;
    # a NaN or a silently biased finite value are the failure modes
    assert not np.isnan(ll)
    if np.isfinite(ll):
        P_star = periodic_fixed_point(T, R, Q, Z, H, pattern, n_cycles=6000)
        P0_seed = seed_covariance_for_exact_filter(
            T, R, Q, Z, H, pattern, P_star)
        ll_ref = float(kalman_filter(y_nan, T, R, Q, Z, H, d=d,
                                     P0=P0_seed).loglik)
        np.testing.assert_allclose(ll, ll_ref, rtol=1e-5,
                                   atol=1e-5 * abs(ll_ref))


def test_detect_mask_period_edges():
    import numpy as np

    from geconpy_tpu.ops.cyclo_kalman import detect_mask_period

    # fully observed -> trivial period 1
    assert detect_mask_period(np.ones((30, 2), bool)) == 1
    # 5-periodic pattern with a PARTIAL last cycle still detects p=5
    pattern = np.ones((5, 2), bool)
    pattern[1, 0] = False
    pattern[4, 1] = False
    mask = np.tile(pattern, (5, 1))[:23]
    assert detect_mask_period(mask) == 5
    # the SMALLEST valid period wins: a 3-pattern repeated is not "6"
    p3 = np.ones((3, 1), bool)
    p3[2, 0] = False
    assert detect_mask_period(np.tile(p3, (8, 1))) == 3
    # aperiodic (one isolated hole) -> None
    ap = np.ones((30, 1), bool)
    ap[13, 0] = False
    assert detect_mask_period(ap) is None
    # periodic but beyond max_period -> None
    p30 = np.ones((30, 1), bool)
    p30[29, 0] = False
    long = np.tile(p30, (3, 1))
    assert detect_mask_period(long, max_period=24) is None
    assert detect_mask_period(long, max_period=30) == 30
