"""Stationary (constant-gain-from-t0) Kalman filter with implicit DARE
adjoint: value equals the exact filter initialized at the DARE fixed point;
gradients equal autodiff through a fully differentiable settle."""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.ops.kalman import (_dare_step, kalman_filter,
                                    stationary_kalman_loglik)


def _random_system(key, n=5, k=2, m=3):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    T = 0.85 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, m)) / np.sqrt(m)
    Q = jnp.diag(0.05 + jax.random.uniform(k3, (m,)))
    Z = jax.random.normal(k4, (k, n)) / np.sqrt(n)
    H = jnp.diag(0.01 + 0.05 * jax.random.uniform(k5, (k,)))
    d = jnp.zeros((k,))
    return T, R, Q, Z, H, d


def _simulate(key, T, R, Q, Z, H, periods=80):
    m = R.shape[1]
    k = Z.shape[0]
    eps = jax.random.normal(key, (periods, m)) @ jnp.linalg.cholesky(Q).T
    xs = []
    x = jnp.zeros(T.shape[0])
    for t in range(periods):
        x = T @ x + R @ eps[t]
        xs.append(x)
    obs_noise = jax.random.normal(jax.random.fold_in(key, 1),
                                  (periods, k)) @ jnp.linalg.cholesky(H).T
    return jnp.stack(xs) @ Z.T + obs_noise


def _dare_fixed_point(T, RQR, Z, H, iters=400):
    P = RQR
    for _ in range(iters):
        P = _dare_step(P, T, RQR, Z, H)
    return P


def test_value_equals_exact_filter_at_fixed_point():
    T, R, Q, Z, H, d = _random_system(jax.random.PRNGKey(0))
    y = _simulate(jax.random.PRNGKey(1), T, R, Q, Z, H)
    P_inf = _dare_fixed_point(T, R @ Q @ R.T, Z, H)
    # the exact filter predicts before its first update, so its P0 must be
    # the UPDATED stationary covariance: T P_upd T' + RQR = P_inf
    PZt = P_inf @ Z.T
    K = np.linalg.solve(Z @ PZt + H, PZt.T).T
    P_upd = P_inf - K @ PZt.T
    ll_exact = kalman_filter(y, T, R, Q, Z, H, d=d, P0=P_upd).loglik
    ll_stat = stationary_kalman_loglik(y, T, R, Q, Z, H, d=d, n_settle=200)
    np.testing.assert_allclose(float(ll_stat), float(ll_exact), rtol=1e-10)


def test_gradient_matches_differentiable_settle():
    """Implicit DARE adjoint vs brute-force autodiff through a long,
    fully differentiable Riccati settle."""
    T, R, Q, Z, H, d = _random_system(jax.random.PRNGKey(2))
    y = _simulate(jax.random.PRNGKey(3), T, R, Q, Z, H, periods=60)

    def brute(T_, R_, Q_):
        RQR = R_ @ Q_ @ R_.T
        P = RQR
        P, _ = jax.lax.scan(lambda p, _:
                            (_dare_step(p, T_, RQR, Z, H), None),
                            P, None, length=150)
        # constant-gain filter with differentiable P (same math as the op)
        PZt = P @ Z.T
        S = Z @ PZt + H
        chol_S = jnp.linalg.cholesky(S)
        K = jax.scipy.linalg.cho_solve((chol_S, True), PZt.T).T
        TK = T_ @ K
        M = T_ - TK @ Z
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_S)))
        const = -0.5 * (Z.shape[0] * np.log(2 * np.pi) + logdet)

        def step(x, y_t):
            v = y_t - Z @ x - d
            w = jax.scipy.linalg.cho_solve((chol_S, True), v)
            return M @ x + TK @ (y_t - d), const - 0.5 * (v @ w)

        _, ll_t = jax.lax.scan(step, jnp.zeros(T_.shape[0]), y)
        return jnp.sum(ll_t)

    def ours(T_, R_, Q_):
        return stationary_kalman_loglik(y, T_, R_, Q_, Z, H, d=d,
                                        n_settle=150)

    g_brute = jax.grad(brute, argnums=(0, 1, 2))(T, R, Q)
    g_ours = jax.grad(ours, argnums=(0, 1, 2))(T, R, Q)
    for gb, go, name in zip(g_brute, g_ours, "TRQ"):
        np.testing.assert_allclose(np.asarray(go), np.asarray(gb),
                                   rtol=1e-6, atol=1e-8,
                                   err_msg=f"grad wrt {name}")


def test_statespace_stationary_filter_end_to_end():
    """filter_type='stationary' plugs into the estimation pipeline and its
    logpost agrees with filter_type='steady_state' at long settle."""
    from geconpy_tpu import get_example_gcn, model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)

    def build(ft):
        ss = DSGEStateSpace(model)
        ss.configure(observed_states=["Y"],
                     constant_params=["alpha", "sigma_C"],
                     filter_type=ft, kalman_settle=80)
        return ss

    ss_a = build("stationary")
    ss_b = build("steady_state")
    data, draw = ss_a.data_from_prior(jax.random.PRNGKey(0), periods=120)
    u = jnp.asarray(ss_a.unconstrain(draw))
    lp_a, g_a = jax.value_and_grad(ss_a.build_logpost(np.asarray(data)))(u)
    lp_b = ss_b.build_logpost(np.asarray(data))(u)
    # same stationary-likelihood value up to settle truncation of the exact
    # head phase; at settle=80 of 120 periods they agree tightly
    np.testing.assert_allclose(float(lp_a), float(lp_b), rtol=2e-3)
    assert np.all(np.isfinite(np.asarray(g_a)))


def test_hewer_settle_converges_near_unit_root():
    """The Hewer gain-iteration settle reaches the DARE fixed point at
    machine precision even for near-unit-root T, where plain Riccati
    iteration at the same budget is far from converged."""
    import jax

    key = jax.random.PRNGKey(9)
    n, m = 4, 2
    k1, k2 = jax.random.split(key, 2)
    # one root at 0.999, rest moderate; the slow mode is NOT observed, so
    # the closed loop keeps the 0.999 pole and plain Riccati converges at
    # rate 0.999^2 per step
    U = jax.random.orthogonal(k1, n)
    T = U @ jnp.diag(jnp.array([0.999, 0.6, 0.3, 0.1])) @ U.T
    R = jax.random.normal(k2, (n, m))
    Q = 0.01 * jnp.eye(m)
    Z = U[:, 1][None, :]   # observe only the 0.6 mode's coordinate
    H = 0.001 * jnp.eye(1)
    RQR = R @ Q @ R.T

    P_exact = _dare_fixed_point(T, RQR, Z, H, iters=400_00)

    # plain iteration at the op's budget: still far away
    P_plain = RQR
    for _ in range(12):
        P_plain = _dare_step(P_plain, T, RQR, Z, H)
    err_plain = float(jnp.max(jnp.abs(P_plain - P_exact)) /
                      jnp.max(jnp.abs(P_exact)))
    assert err_plain > 1e-3  # plain is NOT converged at this budget

    # the op (8 riccati + 4 hewer) agrees with the exact filter
    y = _simulate(jax.random.PRNGKey(10), T, R, Q, Z, H, periods=50)
    PZt = P_exact @ Z.T
    K = np.linalg.solve(np.asarray(Z @ PZt + H), np.asarray(PZt.T)).T
    P_upd = np.asarray(P_exact) - K @ np.asarray(PZt.T)
    ll_exact = kalman_filter(y, T, R, Q, Z, H, P0=P_upd).loglik
    ll_stat = stationary_kalman_loglik(y, T, R, Q, Z, H, n_settle=8)
    np.testing.assert_allclose(float(ll_stat), float(ll_exact), rtol=1e-8)


def test_settle_unbiased_tiny_innovations():
    """The SW-2007 pathology in miniature: no measurement error and shock
    scales separated by orders of magnitude make the innovation covariance
    S = Z P Z' nearly singular, which shrinks the Hewer iteration's
    quadratic basin (constant ~ 1/lambda_min(S)) — a FIXED 4-stage settle
    leaves an O(1)-O(100) log-likelihood bias here.  The adaptive
    continuation must iterate to the fixed point: the settle likelihood has
    to match the likelihood at a brute-force converged DARE solution."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    n, k = 8, 3
    # persistent dynamics (rho ~ 0.97) + widely separated shock scales
    T = 0.97 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, k)) / np.sqrt(k)
    # SW-2007-like conditioning: lambda_min(S)/lambda_max(S) ~ 1e-3 (the
    # measured bench-batch value); far wider separations (1e-8+) need more
    # than the settle's stage cap and are rejected as -inf instead
    Q = jnp.diag(jnp.asarray([1e-2, 2e-3, 5e-4]) ** 2)
    Z = jax.random.normal(k3, (k, n)) / np.sqrt(n)
    H = jnp.zeros((k, k))          # no measurement error
    d = jnp.zeros((k,))
    y = _simulate(jax.random.PRNGKey(8), T, R, Q, Z, jnp.eye(k) * 1e-18,
                  periods=150)

    RQR = R @ Q @ R.T
    P_ref = _dare_fixed_point(T, RQR, Z, H, iters=4000)
    resid = float(jnp.max(jnp.abs(_dare_step(P_ref, T, RQR, Z, H) - P_ref)))
    # plain Riccati iteration floors at ~condition * eps relative; 1e-8
    # relative residual translates to < 1e-6 log-likelihood units here
    assert resid < 1e-8 * float(jnp.max(jnp.abs(P_ref)))

    from geconpy_tpu.ops.kalman import stationary_loglik_from_P

    ll_ref = float(stationary_loglik_from_P(
        y, T, RQR, Z, H, d, jnp.zeros((n,)), P_ref))
    ll_settle = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d))
    assert np.isfinite(ll_ref)
    np.testing.assert_allclose(ll_settle, ll_ref,
                               atol=1e-4 * max(1.0, abs(ll_ref)) * 1e-2,
                               rtol=1e-6)

    # guard that this case actually exercises the pathology: a 4-stage-only
    # settle IS measurably biased (if this ever passes, the fixture lost
    # its ill-conditioning and the test above proves nothing)
    from geconpy_tpu.ops.kalman import _spd_inverse
    from geconpy_tpu.ops.lyapunov import _doubling

    P4 = _doubling(T, RQR, 1e-14, 60)
    for _ in range(4):
        PZt = P4 @ Z.T
        S_h = Z @ PZt + H
        Kp = T @ (PZt @ _spd_inverse(S_h))
        A_cl = T - Kp @ Z
        P4 = _doubling(A_cl, RQR, 1e-14, 60)
        P4 = 0.5 * (P4 + P4.T)
    ll_4 = float(stationary_loglik_from_P(
        y, T, RQR, Z, H, d, jnp.zeros((n,)), P4))
    assert abs(ll_4 - ll_ref) > 0.1, (
        "fixture no longer ill-conditioned enough to regress the settle")


def test_n_settle_caps_adaptive_stages():
    """n_settle is the TOTAL Hewer stage cap: a cap too small for an
    ill-conditioned draw rejects it as -inf instead of returning a biased
    value; a generous cap converges (ADVICE round 4: the parameter used to
    be silently ignored)."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    n, k = 8, 3
    T = 0.97 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, k)) / np.sqrt(k)
    Q = jnp.diag(jnp.asarray([1e-2, 2e-3, 5e-4]) ** 2)
    Z = jax.random.normal(k3, (k, n)) / np.sqrt(n)
    H = jnp.zeros((k, k))
    d = jnp.zeros((k,))
    y = _simulate(jax.random.PRNGKey(8), T, R, Q, Z, jnp.eye(k) * 1e-18,
                  periods=150)

    ll_wide = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                             n_settle=32))
    assert np.isfinite(ll_wide)
    # a cap of 5 total stages (= 4 floor + 1 adaptive) cannot settle this
    # fixture — it needs ~8-10 stages (see the bias test above) — so the
    # draw must be REJECTED, not returned with an O(1)+ bias
    ll_tight = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                              n_settle=5))
    assert ll_tight == -np.inf


def test_gj_inverse_handles_zero_pivots():
    """The general Gauss-Jordan inverse pivots rows: a matrix with zero
    diagonal (where the SPD no-pivot sweep would divide by zero) still
    inverts to machine precision."""
    from geconpy_tpu.ops.kalman import _gj_inverse

    W = jnp.asarray([[0.0, 1.0, 0.0],
                     [1.0, 0.0, 0.0],
                     [0.0, 0.0, 2.0]])
    err = float(jnp.max(jnp.abs(_gj_inverse(W) @ W - jnp.eye(3))))
    assert err < 1e-14

    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (12, 12)) + 5.0 * jnp.eye(12)
    err = float(jnp.max(jnp.abs(_gj_inverse(A) @ A - jnp.eye(12))))
    assert err < 1e-12


def test_sda_settle_matches_brute_force_from_unconditional_covariance():
    """The SDA doubling settle (certified draws) reproduces the limit of
    plain Riccati iteration STARTED AT THE UNCONDITIONAL COVARIANCE — the
    sequential filter's convention — across spectral radii, with and
    without measurement error (H = 0 is the estimation hot path)."""
    from geconpy_tpu.ops.kalman import _hewer_settle, _sda_settle
    from geconpy_tpu.ops.lyapunov import _doubling

    rng = np.random.default_rng(0)
    checked = 0
    for rho in (0.5, 0.9, 0.97, 0.995):
        for h_scale in (0.0, 0.3):
            A = rng.standard_normal((8, 8))
            T = jnp.asarray(rho / np.abs(np.linalg.eigvals(A)).max() * A)
            R = jnp.asarray(rng.standard_normal((8, 3)))
            RQR = R @ R.T
            Z = jnp.asarray(rng.standard_normal((3, 8)))
            H = h_scale * jnp.eye(3)

            P = _doubling(T, RQR, 1e-14, 60)
            for _ in range(20000):
                P2 = _dare_step(P, T, RQR, Z, H)
                if float(jnp.max(jnp.abs(P2 - P))) < 1e-14 * float(
                        jnp.max(jnp.abs(P2))):
                    break
                P = P2
            P_oracle = P2

            scale = float(jnp.max(jnp.abs(P_oracle)))
            P_sda, cert = _sda_settle(T, RQR, Z, H)
            if bool(cert):
                np.testing.assert_allclose(np.asarray(P_sda),
                                           np.asarray(P_oracle),
                                           atol=1e-9 * scale)
                checked += 1
            # the Hewer settle must agree too (shared oracle)
            P_h, settled = _hewer_settle(T, RQR, Z, H, 48)
            assert bool(settled)
            np.testing.assert_allclose(np.asarray(P_h), np.asarray(P_oracle),
                                       atol=1e-9 * scale)
    assert checked >= 5, "SDA certified too few cases to be meaningful"


def test_sda_certificate_is_honest_on_degenerate_exact_observation():
    """With H = 0 and exact observation the DARE can have several PSD fixed
    points; the from-zero doubling trajectory can approach a DIFFERENT one
    than the filter's from-unconditional-covariance limit.  Whatever the
    SDA path reports, 'auto' must equal the Hewer reference — certified
    draws because the start correction lands them on the right limit,
    uncertified ones through the fallback."""
    from geconpy_tpu.ops.kalman import _auto_settle, _hewer_settle

    rng = np.random.default_rng(0)
    disagreements = 0
    for _ in range(6):
        A = rng.standard_normal((8, 8))
        T = jnp.asarray(0.97 / np.abs(np.linalg.eigvals(A)).max() * A)
        R = jnp.asarray(rng.standard_normal((8, 3)))
        RQR = R @ R.T
        Z = jnp.asarray(rng.standard_normal((3, 8)))
        H = jnp.zeros((3, 3))

        P_h, settled = _hewer_settle(T, RQR, Z, H, 48)
        P_a, settled_a = _auto_settle(T, RQR, Z, H, 48)
        assert bool(settled_a) == bool(settled)
        if bool(settled):
            scale = float(jnp.max(jnp.abs(P_h)))
            np.testing.assert_allclose(np.asarray(P_a), np.asarray(P_h),
                                       atol=1e-8 * scale)
        disagreements += 1
    assert disagreements == 6


def test_settle_methods_agree_on_loglik():
    """settle_method='auto' and 'hewer' give the same stationary likelihood
    (certified draws take the SDA fast path; the values must still match the
    Hewer reference at the dtype's noise floor)."""
    T, R, Q, Z, H, d = _random_system(jax.random.PRNGKey(21))
    y = _simulate(jax.random.PRNGKey(22), T, R, Q, Z, H, periods=80)
    ll_auto = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                             settle_method="auto"))
    ll_hewer = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                              settle_method="hewer"))
    ll_sda = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                            settle_method="sda"))
    assert np.isfinite(ll_hewer)
    np.testing.assert_allclose(ll_auto, ll_hewer, rtol=1e-9)
    # well-conditioned system: SDA certifies and matches
    np.testing.assert_allclose(ll_sda, ll_hewer, rtol=1e-9)


def test_auto_settle_falls_back_when_sda_uncertified():
    """H-tilde = H + Z RQR Z' singular (a noiseless observable no shock
    reaches within one period) breaks the SDA shift; 'auto' must recover
    through the Hewer fallback, 'sda' alone must reject as -inf — never
    return a silently wrong value."""
    key = jax.random.PRNGKey(30)
    k1, k2 = jax.random.split(key)
    n = 5
    T = 0.8 * jax.random.orthogonal(k1, n)
    # one shock loading only on state 0
    R = jnp.zeros((n, 1)).at[0, 0].set(1.0)
    Q = jnp.eye(1)
    # observe state 0 (shock-reached) AND a pure function of states 1..4
    # (unreached within one period: Z RQR Z' is singular)
    Z = jnp.zeros((2, n)).at[0, 0].set(1.0).at[1, 2].set(1.0)
    H = jnp.zeros((2, 2))
    d = jnp.zeros((2,))
    RQR = R @ Q @ R.T
    assert np.linalg.matrix_rank(np.asarray(Z @ RQR @ Z.T)) < 2

    y = _simulate(jax.random.PRNGKey(31), T, R, Q, Z,
                  1e-18 * jnp.eye(2), periods=60)

    from geconpy_tpu.ops.kalman import _sda_settle

    _, cert = _sda_settle(T, RQR, Z, H)
    assert not bool(cert)

    ll_hewer = stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                        settle_method="hewer")
    ll_auto = stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                       settle_method="auto")
    ll_sda = stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                      settle_method="sda")
    assert float(ll_sda) == -np.inf
    np.testing.assert_allclose(float(ll_auto), float(ll_hewer), rtol=1e-9)


def test_sda_settle_unbiased_tiny_innovations():
    """The SW-2007 tiny-innovation pathology, SDA edition (CLAUDE.md
    invariant: every new settle schedule needs a float64 bias check): on
    the ill-conditioned fixture the SDA path must either match the
    brute-force DARE likelihood or reject the draw — never return a biased
    value."""
    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    n, k = 8, 3
    T = 0.97 * jax.random.orthogonal(k1, n)
    R = jax.random.normal(k2, (n, k)) / np.sqrt(k)
    Q = jnp.diag(jnp.asarray([1e-2, 2e-3, 5e-4]) ** 2)
    Z = jax.random.normal(k3, (k, n)) / np.sqrt(n)
    H = jnp.zeros((k, k))
    d = jnp.zeros((k,))
    y = _simulate(jax.random.PRNGKey(8), T, R, Q, Z, jnp.eye(k) * 1e-18,
                  periods=150)

    RQR = R @ Q @ R.T
    P_ref = _dare_fixed_point(T, RQR, Z, H, iters=4000)

    from geconpy_tpu.ops.kalman import stationary_loglik_from_P

    ll_ref = float(stationary_loglik_from_P(
        y, T, RQR, Z, H, d, jnp.zeros((n,)), P_ref))
    for method in ("sda", "auto"):
        ll = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                            settle_method=method))
        assert ll == -np.inf or abs(ll - ll_ref) < 1e-6 * abs(ll_ref), (
            f"settle_method={method} returned a biased likelihood: "
            f"{ll} vs {ll_ref}")
    # 'auto' must converge here (the Hewer fallback handles it)
    ll_auto = float(stationary_kalman_loglik(y, T, R, Q, Z, H, d=d,
                                             settle_method="auto"))
    np.testing.assert_allclose(ll_auto, ll_ref, rtol=1e-6)


def test_nonfinite_settle_rejected_as_neg_inf_not_nan():
    """NaN inputs must flow out as -inf, never NaN (failure = flags): a
    non-finite Hewer delta exits the settle loop UN-settled."""
    key = jax.random.PRNGKey(11)
    T, R, Q, Z, H, d = _random_system(key)
    y = _simulate(jax.random.PRNGKey(12), T, R, Q, Z, H, periods=40)
    T_bad = T.at[0, 0].set(jnp.nan)
    ll = float(stationary_kalman_loglik(y, T_bad, R, Q, Z, H, d=d))
    assert ll == -np.inf
