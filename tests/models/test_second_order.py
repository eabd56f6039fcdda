"""Second-order perturbation tests (models/second_order.py).

Beyond reference parity (gEconpy is first-order only).  Anchors:

- Brock-Mirman has the closed-form policy K' = alpha*beta*A*K^alpha — exactly
  linear in logs (every second-order coefficient vanishes) with an
  analytically known level-coordinate Taylor expansion.
- For any model, plugging the second-order policy into the true nonlinear
  equations must leave a residual of O(h^3) in the perturbation size h
  (first order leaves O(h^2)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import geconpy_tpu
from geconpy_tpu.models.second_order import (
    irf_second_order,
    simulate_pruned,
)

ALPHA, BETA, RHO = 0.33, 0.96, 0.9


@pytest.fixture(scope="module")
def bm():
    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("brock_mirman"), verbose=False)
    return model


def test_loglin_second_order_vanishes(bm):
    """In log coordinates the Brock-Mirman policy is exactly linear: all
    second-order blocks must be numerically zero (lambda = 1/C and
    Y = A K^alpha are log-linear too)."""
    sol, res2 = bm.solve_model_second_order(shock_std=0.01)
    assert bool(res2.success)
    assert float(jnp.max(jnp.abs(res2.G_xx))) < 1e-7
    assert float(jnp.max(jnp.abs(res2.G_xu))) < 1e-7
    assert float(jnp.max(jnp.abs(res2.G_uu))) < 1e-7
    assert float(jnp.max(jnp.abs(res2.g_ss))) < 1e-7


def test_level_second_order_matches_analytic(bm):
    """Level-coordinate quadratic terms of K' = alpha*beta*A'^  K^alpha with
    A_t = A_{t-1}^rho e^eps, differentiated at the steady state."""
    sol, res2 = bm.solve_model_second_order(loglin_variables=False,
                                            shock_std=0.01)
    assert bool(res2.success)
    names = list(sol.T.index)
    iK, iA = names.index("K"), names.index("A")
    K = (ALPHA * BETA) ** (1 / (1 - ALPHA))
    ab = ALPHA * BETA

    G_xx = np.asarray(res2.G_xx)
    G_xu = np.asarray(res2.G_xu)
    G_uu = np.asarray(res2.G_uu)

    # g_K(K_, A_, eps) = ab * A_^rho e^eps * K_^alpha
    d2_KK = ab * ALPHA * (ALPHA - 1) * K ** (ALPHA - 2)
    d2_KA = ab * RHO * ALPHA * K ** (ALPHA - 1)
    d2_AA = ab * RHO * (RHO - 1) * K ** ALPHA
    d2_Ke = ab * ALPHA * K ** (ALPHA - 1)
    d2_Ae = ab * RHO * K ** ALPHA
    d2_ee = ab * K ** ALPHA

    np.testing.assert_allclose(G_xx[iK, iK, iK], d2_KK, rtol=1e-6)
    np.testing.assert_allclose(G_xx[iK, iK, iA], d2_KA, rtol=1e-6)
    np.testing.assert_allclose(G_xx[iK, iA, iA], d2_AA, rtol=1e-6)
    np.testing.assert_allclose(G_xu[iK, iK, 0], d2_Ke, rtol=1e-6)
    np.testing.assert_allclose(G_xu[iK, iA, 0], d2_Ae, rtol=1e-6)
    np.testing.assert_allclose(G_uu[iK, 0, 0], d2_ee, rtol=1e-6)

    # symmetry of the quadratic blocks
    np.testing.assert_allclose(G_xx, np.swapaxes(G_xx, 1, 2), atol=1e-12)
    np.testing.assert_allclose(G_uu, np.swapaxes(G_uu, 1, 2), atol=1e-12)


def _unpruned_policy(T, R, res2, xhat, eps):
    lin = T @ xhat + R @ eps
    quad = 0.5 * jnp.einsum("ijk,j,k->i", res2.G_xx, xhat, xhat) \
        + jnp.einsum("ijk,j,k->i", res2.G_xu, xhat, eps) \
        + 0.5 * jnp.einsum("ijk,j,k->i", res2.G_uu, eps, eps)
    return lin + quad


def _residual_norm(model, sol, res2, h, order, rng):
    """Residual of the true nonlinear equations along the (certainty-
    equivalent) order-1/2 policy at perturbation size h."""
    mf = model.functions
    n, k = mf.n_variables, mf.n_shocks
    theta = model.default_theta()
    ss = jax.jit(model.ss_solver)(theta)
    x_ss, theta_full = ss.x_ss, ss.theta_full
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    scale = jnp.asarray(sol.loglin_scale)
    is_log = jnp.asarray(np.abs(np.asarray(sol.loglin_scale)
                                - np.asarray(x_ss)) < 1e-12) & (x_ss > 1e-8)

    def tx(yhat):
        return jnp.where(is_log, x_ss * jnp.exp(yhat), x_ss + yhat)

    dir_x = jnp.asarray(rng.standard_normal(n))
    dir_x = dir_x / jnp.linalg.norm(dir_x)
    dir_e = jnp.asarray(rng.standard_normal(k))
    dir_e = dir_e / jnp.linalg.norm(dir_e)

    xhat = h * dir_x
    eps = h * dir_e
    zero_e = jnp.zeros((k,))
    if order == 1:
        y0 = T @ xhat + R @ eps
        y1 = T @ y0
    else:
        y0 = _unpruned_policy(T, R, res2, xhat, eps)
        y1 = _unpruned_policy(T, R, res2, y0, zero_e)
    resid = mf.f_resid(tx(xhat), tx(y0), tx(y1), eps, x_ss, theta_full)
    return float(jnp.max(jnp.abs(resid)))


def test_brock_mirman_policy_exact_in_logs(bm):
    """The log-coordinate second-order policy IS the exact policy: nonlinear
    residuals along it sit at machine epsilon for any perturbation size."""
    sol, res2 = bm.solve_model_second_order(shock_std=0.01)
    for h in (0.02, 0.2):
        r2 = _residual_norm(bm, sol, res2, h, 2, np.random.default_rng(0))
        assert r2 < 1e-12, (h, r2)


@pytest.mark.parametrize("name", ["rbc", "rbc_ces"])
def test_taylor_residual_scaling(name):
    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn(name),
                                       verbose=False)
    sol, res2 = model.solve_model_second_order(shock_std=0.01)
    rng = np.random.default_rng(0)

    h = 0.02
    r1_h = _residual_norm(model, sol, res2, h, 1, np.random.default_rng(0))
    r1_h2 = _residual_norm(model, sol, res2, h / 2, 1, np.random.default_rng(0))
    r2_h = _residual_norm(model, sol, res2, h, 2, np.random.default_rng(0))
    r2_h2 = _residual_norm(model, sol, res2, h / 2, 2, np.random.default_rng(0))

    # second order: residual drops ~8x when h halves; first order: ~4x
    assert r2_h / r2_h2 > 6.0, (r2_h, r2_h2)
    assert 3.0 < r1_h / r1_h2 < 5.5, (r1_h, r1_h2)
    # and the second-order residual is much smaller outright
    assert r2_h < 0.05 * r1_h


def test_brock_mirman_level_simulation_beats_first_order(bm):
    """Simulate the EXACT nonlinear Brock-Mirman dynamics and compare level
    paths: the pruned second-order error must be far below first order."""
    sol, res2 = bm.solve_model_second_order(loglin_variables=False,
                                            shock_std=0.02)
    names = list(sol.T.index)
    iK, iA = names.index("K"), names.index("A")
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    K_ss = (ALPHA * BETA) ** (1 / (1 - ALPHA))

    rng = np.random.default_rng(5)
    periods = 60
    eps = 0.02 * rng.standard_normal((periods, 1))

    # exact: K' = ab A' K^alpha, A' = A^rho e^eps
    K_path, A_path = [], []
    K_, A_ = K_ss, 1.0
    for t in range(periods):
        A_ = A_ ** RHO * np.exp(eps[t, 0])
        K_ = ALPHA * BETA * A_ * K_ ** ALPHA
        K_path.append(K_)
        A_path.append(A_)
    K_exact = np.asarray(K_path)

    path2 = np.asarray(simulate_pruned(T, R, res2, jnp.asarray(eps),
                                       with_gss=False))

    def first_order_path():
        x = jnp.zeros(T.shape[0])
        out = []
        for t in range(periods):
            x = T @ x + R @ jnp.asarray(eps[t])
            out.append(np.asarray(x))
        return np.asarray(out)

    path1 = first_order_path()
    err1 = np.max(np.abs(path1[:, iK] + K_ss - K_exact))
    err2 = np.max(np.abs(path2[:, iK] + K_ss - K_exact))
    assert err2 < 0.25 * err1, (err1, err2)


def test_irf_asymmetry_in_levels(bm):
    """Second-order level IRFs are asymmetric in the shock sign (a pure
    first-order IRF is exactly antisymmetric)."""
    sol, res2 = bm.solve_model_second_order(loglin_variables=False,
                                            shock_std=0.05)
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    up = np.asarray(irf_second_order(T, R, res2, jnp.array([0.1]), periods=20))
    down = np.asarray(irf_second_order(T, R, res2, jnp.array([-0.1]), periods=20))
    asym = np.max(np.abs(up + down))
    assert asym > 1e-5          # genuinely asymmetric
    assert np.all(np.isfinite(up)) and np.all(np.isfinite(down))


def test_pruned_simulation_stays_bounded(bm):
    """Pruning guarantee: second-order simulation cannot explode even with
    large shocks where the unpruned quadratic recursion would."""
    sol, res2 = bm.solve_model_second_order(shock_std=0.1)
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    rng = np.random.default_rng(7)
    eps = 0.1 * rng.standard_normal((2000, 1))
    path = np.asarray(simulate_pruned(T, R, res2, jnp.asarray(eps)))
    assert np.all(np.isfinite(path))
    assert np.max(np.abs(path)) < 10.0


def test_uncertainty_correction_sign_rbc():
    """In the RBC model the g_ss correction is nonzero and finite: second-
    order means shift away from the deterministic steady state."""
    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc"),
                                       verbose=False)
    sol, res2 = model.solve_model_second_order(shock_std=0.05)
    assert bool(res2.success)
    g_ss = np.asarray(res2.g_ss)
    assert np.all(np.isfinite(g_ss))
    assert np.max(np.abs(g_ss)) > 1e-8


def test_labeled_second_order_wrappers(bm):
    """analysis-layer labeled wrappers: shapes, labels, and consistency with
    the raw pruned simulator."""
    from geconpy_tpu.analysis import (impulse_response_second_order,
                                      simulate_second_order)

    sol, res2 = bm.solve_model_second_order(shock_std=0.02)
    sims = simulate_second_order(sol, res2, periods=30, n_simulations=5,
                                 shock_std=0.02, seed=1)
    assert sims.index.names == ["simulation", "time"]
    assert list(sims.columns) == list(sol.T.columns)
    assert len(sims) == 150
    assert np.all(np.isfinite(sims.to_numpy()))

    irf = impulse_response_second_order(sol, res2, periods=12,
                                        shock_size=0.05)
    assert irf.index.names == ["shock", "time"]
    # a positive technology impulse raises capital on impact
    assert irf.loc[("epsilon", 0), "K"] > 0


def test_second_order_mean_matches_long_simulation(bm):
    """Closed-form E[y2] = (I-T)^{-1}(.5 Gxx:Sigma1 + .5 Guu:Q + .5 g_ss)
    against the empirical mean of a long pruned simulation."""
    from geconpy_tpu.models.second_order import second_order_mean

    sigma = 0.05
    # level coordinates: Brock-Mirman's curvature is genuine there (in logs
    # the model is exactly linear and the shift is zero by construction)
    sol, res2 = bm.solve_model_second_order(loglin_variables=False,
                                            shock_std=sigma)
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    Q = jnp.array([[sigma**2]])

    mean_exact = np.asarray(second_order_mean(T, R, res2, Q))
    # means are a genuine second-order effect (nonzero here)
    assert np.max(np.abs(mean_exact)) > 1e-5

    rng = np.random.default_rng(11)
    periods = 400_000
    eps = sigma * rng.standard_normal((periods, 1))
    path = np.asarray(simulate_pruned(T, R, res2, jnp.asarray(eps)))
    mean_mc = path[1000:].mean(axis=0)
    se = path[1000:].std(axis=0) / np.sqrt((periods - 1000) / 50)  # ~AR corr
    tol = np.maximum(4 * se, 5e-5)
    assert np.all(np.abs(mean_mc - mean_exact) <= tol), \
        (mean_mc, mean_exact, tol)


def test_generalized_irf_reduces_to_deterministic_at_first_order(bm):
    """With all quadratic blocks zero (Brock-Mirman in logs) the GIRF is
    state- and shock-path-independent and equals the deterministic IRF."""
    from geconpy_tpu.models.second_order import generalized_irf

    sol, res2 = bm.solve_model_second_order(shock_std=0.02)
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    Q = jnp.array([[0.02**2]])
    det = irf_second_order(T, R, res2, jnp.array([0.05]), periods=15)
    girf = generalized_irf(T, R, res2, jnp.array([0.05]), Q, periods=15,
                           n_draws=16)
    np.testing.assert_allclose(np.asarray(girf), np.asarray(det), atol=1e-7)


def test_generalized_irf_state_dependent_in_levels(bm):
    """At second order in levels the response depends on the initial state
    (concavity of the policy): GIRF from a high-capital state differs from
    the steady-state GIRF."""
    from geconpy_tpu.models.second_order import generalized_irf

    sol, res2 = bm.solve_model_second_order(loglin_variables=False,
                                            shock_std=0.02)
    names = list(sol.T.index)
    iK = names.index("K")
    T = jnp.asarray(sol.T.to_numpy())
    R = jnp.asarray(sol.R.to_numpy())
    Q = jnp.array([[0.02**2]])
    shock = jnp.array([0.1])

    girf_ss = generalized_irf(T, R, res2, shock, Q, periods=10, n_draws=64)
    x_hi = jnp.zeros(T.shape[0]).at[iK].set(0.05)
    girf_hi = generalized_irf(T, R, res2, shock, Q, periods=10, n_draws=64,
                              x0=x_hi)
    diff = np.max(np.abs(np.asarray(girf_hi[:, iK] - girf_ss[:, iK])))
    assert diff > 1e-5
    assert np.all(np.isfinite(np.asarray(girf_hi)))


def test_quadratic_sylvester_adjoint_matches_fd():
    """The custom_vjp of solve_quadratic_sylvester (implicit transposed-
    Sylvester adjoint) must match finite differences in every argument —
    this is what NUTS differentiates at second order."""
    from geconpy_tpu.models.second_order import solve_quadratic_sylvester

    rng = np.random.default_rng(0)
    n = 4
    T0 = jnp.asarray(rng.normal(size=(n, n)) * 0.2)
    A_l = jnp.asarray(rng.normal(size=(n, n)) + 3.0 * np.eye(n))
    C = jnp.asarray(rng.normal(size=(n, n)) * 0.3)
    K = jnp.asarray(rng.normal(size=(n, n, n)))
    V = jnp.asarray(rng.normal(size=(n, n, n)))  # cotangent direction

    def scalar(A_l_, C_, T_, K_):
        X, _ = solve_quadratic_sylvester(A_l_, C_, T_, K_)
        return jnp.sum(X * V)

    grads = jax.grad(scalar, argnums=(0, 1, 2, 3))(A_l, C, T0, K)
    eps = 1e-6
    args = [A_l, C, T0, K]
    for ai in range(4):
        g = np.asarray(grads[ai])
        a = np.asarray(args[ai])
        idxs = [tuple(rng.integers(0, n, a.ndim)) for _ in range(5)]
        for idx in idxs:
            perturbed = [jnp.asarray(x) for x in args]
            ap = a.copy(); ap[idx] += eps
            am = a.copy(); am[idx] -= eps
            perturbed[ai] = jnp.asarray(ap)
            fp = float(scalar(*perturbed))
            perturbed[ai] = jnp.asarray(am)
            fm = float(scalar(*perturbed))
            fd = (fp - fm) / (2 * eps)
            assert abs(g[idx] - fd) < 1e-5 * max(1.0, abs(fd)), \
                (ai, idx, g[idx], fd)


# ---------------------------------------------------------------------------
# External oracle #2: Burnside (1998, JEDC) closed-form asset pricing.
# Brock-Mirman pins the quadratic state blocks but its exact policy is
# variance-free (g_ss = 0 identically), so it cannot detect an error in the
# uncertainty correction.  Burnside's lognormal endowment economy has the
# exact solution  y(x, sigma) = sum_i beta^i exp(a_i + b_i (x - xbar))  with
# the sigma^2 term appearing in a_i — every perturbation coefficient,
# INCLUDING g_ss, is an independent published geometric sum.


def _burnside_sums(beta, theta, rho, xbar, n_terms=4000):
    i = np.arange(1, n_terms + 1)
    q = beta * np.exp(theta * xbar)
    b = theta * rho * (1 - rho ** i) / (1 - rho)
    c = q ** i
    v = (theta ** 2 / (2 * (1 - rho) ** 2)) * (
        i - 2 * rho * (1 - rho ** i) / (1 - rho)
        + rho ** 2 * (1 - rho ** (2 * i)) / (1 - rho ** 2))
    return {
        "y_ss": q / (1 - q),
        "S1": float(np.sum(c * b)),          # dy/dx at (xbar, sigma=0)
        "S2": float(np.sum(c * b * b)),      # d2y/dx2
        "Sv": float(np.sum(c * v)),          # dy/d(sigma^2)
    }


@pytest.fixture(scope="module")
def burnside():
    return geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("burnside"), verbose=False)


def test_burnside_first_order_matches_closed_form(burnside):
    beta, theta, rho, xbar = 0.95, -1.5, -0.139, 0.0179
    ex = _burnside_sums(beta, theta, rho, xbar)
    sol = burnside.solve_model(loglin_variables=False, verbose=False)
    names = list(sol.T.index)
    iy, ix = names.index("y"), names.index("x")
    ss = burnside.steady_state(verbose=False).to_string()
    np.testing.assert_allclose(float(ss["y_ss"]), ex["y_ss"], rtol=1e-12)
    np.testing.assert_allclose(sol.T.to_numpy()[iy, ix], ex["S1"] * rho,
                               rtol=1e-9)
    np.testing.assert_allclose(sol.R.to_numpy()[iy, 0], ex["S1"], rtol=1e-9)


def test_burnside_second_order_matches_closed_form(burnside):
    """All quadratic blocks AND the uncertainty correction against the
    published closed form: in y_t = g(x_{t-1}, eps_t, sigma),
    d2y/dx_-2 = S2 rho^2, d2y/(dx_- deps) = S2 rho, d2y/deps2 = S2, and
    (1/2) g_ss = Sv sigma^2 (the sigma^2 coefficient of the exact a_i)."""
    beta, theta, rho, xbar = 0.95, -1.5, -0.139, 0.0179
    sigma = 0.0348                            # Burnside's calibration
    ex = _burnside_sums(beta, theta, rho, xbar)
    sol, res2 = burnside.solve_model_second_order(loglin_variables=False,
                                                  shock_std=sigma)
    assert bool(res2.success)
    names = list(sol.T.index)
    iy, ix = names.index("y"), names.index("x")
    G_xx = np.asarray(res2.G_xx)
    G_xu = np.asarray(res2.G_xu)
    G_uu = np.asarray(res2.G_uu)
    g_ss = np.asarray(res2.g_ss)

    np.testing.assert_allclose(G_xx[iy, ix, ix], ex["S2"] * rho ** 2,
                               rtol=1e-8)
    np.testing.assert_allclose(G_xu[iy, ix, 0], ex["S2"] * rho, rtol=1e-8)
    np.testing.assert_allclose(G_uu[iy, 0, 0], ex["S2"], rtol=1e-8)
    np.testing.assert_allclose(0.5 * g_ss[iy], ex["Sv"] * sigma ** 2,
                               rtol=1e-8)
    # the endowment state is exactly linear: no quadratic terms on the x row
    np.testing.assert_allclose(G_xx[ix], 0.0, atol=1e-10)
    np.testing.assert_allclose(g_ss[ix], 0.0, atol=1e-10)


def test_burnside_second_order_accuracy_vs_exact_function(burnside):
    """Pointwise: the order-2 policy with the uncertainty term tracks the
    exact y(x, sigma) to O(h^3) where the order-1 (certainty-equivalent)
    policy has both an O(h^2) curvature error and an O(sigma^2) level bias."""
    beta, theta, rho, xbar = 0.95, -1.5, -0.139, 0.0179
    sigma = 0.0348
    sol, res2 = burnside.solve_model_second_order(loglin_variables=False,
                                                  shock_std=sigma)
    names = list(sol.T.index)
    iy, ix = names.index("y"), names.index("x")
    T = sol.T.to_numpy()
    R = sol.R.to_numpy()

    def y_exact(x, sig, n_terms=4000):
        i = np.arange(1, n_terms + 1)
        b = theta * rho * (1 - rho ** i) / (1 - rho)
        v = (theta ** 2 / (2 * (1 - rho) ** 2)) * (
            i - 2 * rho * (1 - rho ** i) / (1 - rho)
            + rho ** 2 * (1 - rho ** (2 * i)) / (1 - rho ** 2))
        a = theta * xbar * i + sig ** 2 * v
        return float(np.sum(beta ** i * np.exp(a + b * (x - xbar))))

    y_ss = y_exact(xbar, 0.0)

    def approx_err(h, sig, order):
        xhat_prev = h * 0.02                  # scale of a 2-sd shock path
        eps = h * 0.03
        x_t = xbar + rho * xhat_prev + eps
        truth = y_exact(x_t, sig)
        state = np.zeros(len(names))
        state[ix] = xhat_prev
        e = np.array([eps])
        approx = y_ss + (T @ state + R @ e)[iy]
        if order == 2:
            approx += (
                0.5 * np.asarray(res2.G_xx)[iy, ix, ix] * xhat_prev ** 2
                + np.asarray(res2.G_xu)[iy, ix, 0] * xhat_prev * eps
                + 0.5 * np.asarray(res2.G_uu)[iy, 0, 0] * eps ** 2
                + (0.5 * np.asarray(res2.g_ss)[iy] if sig else 0.0))
        return abs(approx - truth)

    # deterministic accuracy: at sigma = 0 the order-2 error is pure cubic
    # remainder (shrinks ~8x per halving of h); order-1 is quadratic
    e2 = [approx_err(h, 0.0, 2) for h in (0.5, 0.25, 0.125)]
    e1 = [approx_err(h, 0.0, 1) for h in (0.5, 0.25, 0.125)]
    assert e2[1] / e2[0] < 0.25 and e2[2] / e2[1] < 0.25
    assert 0.15 < e1[1] / e1[0] < 0.35        # ~1/4 per halving
    assert all(b < a for a, b in zip(e1, e2))

    # stochastic accuracy: the order-1 (certainty-equivalent) policy has an
    # h-independent sigma^2 level bias; the g_ss term removes it down to
    # the sigma^4 / cross-term remainder of the exact exponential a_i
    err1 = approx_err(0.125, sigma, 1)
    err2 = approx_err(0.125, sigma, 2)
    assert err2 < 0.05 * err1
    i = np.arange(1, 4001)
    v = (theta ** 2 / (2 * (1 - rho) ** 2)) * (
        i - 2 * rho * (1 - rho ** i) / (1 - rho)
        + rho ** 2 * (1 - rho ** (2 * i)) / (1 - rho ** 2))
    c = (beta * np.exp(theta * xbar)) ** i
    sigma_floor = abs(np.sum(c * (np.exp(sigma ** 2 * v)
                                  - 1 - sigma ** 2 * v)))
    assert err2 < 5 * (sigma_floor + e2[2])   # remainder fully accounted for
