import pathlib

import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.analysis.perfect_foresight import solve_perfect_foresight
from geconpy_tpu.ops.block_tridiag import solve_block_tridiagonal

import jax.numpy as jnp

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


def test_block_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    T, n = 12, 4
    A = rng.normal(size=(T, n, n)) * 0.3
    B = rng.normal(size=(T, n, n)) + 3 * np.eye(n)
    C = rng.normal(size=(T, n, n)) * 0.3
    d = rng.normal(size=(T, n))

    x = np.asarray(solve_block_tridiagonal(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C), jnp.asarray(d)))

    # dense assembly oracle
    M = np.zeros((T * n, T * n))
    for t in range(T):
        M[t * n:(t + 1) * n, t * n:(t + 1) * n] = B[t]
        if t > 0:
            M[t * n:(t + 1) * n, (t - 1) * n:t * n] = A[t]
        if t < T - 1:
            M[t * n:(t + 1) * n, (t + 1) * n:(t + 2) * n] = C[t]
    x_dense = np.linalg.solve(M, d.reshape(-1)).reshape(T, n)
    np.testing.assert_allclose(x, x_dense, atol=1e-9)


@pytest.fixture(scope="module")
def rbc():
    return model_from_gcn(str(DATA / "rbc.gcn"))


def test_temporary_shock_trajectory(rbc):
    shock = np.zeros(5)
    shock[0] = 0.05
    res = solve_perfect_foresight(rbc, periods=120,
                                  shocks={"epsilon_A": shock})
    assert res.success, res
    assert res.resid_norm < 1e-8
    traj = res.trajectory
    ss = rbc.steady_state(verbose=False).to_string()

    # starts at SS, impact raises technology and output
    np.testing.assert_allclose(traj.loc[-1, "Y"], ss["Y_ss"], rtol=1e-8)
    assert traj.loc[0, "A"] > 1.0
    assert traj.loc[0, "Y"] > ss["Y_ss"]
    # converges back to the same SS
    np.testing.assert_allclose(traj.loc[120, "Y"], ss["Y_ss"], rtol=1e-8)
    # slow convergence (capital eigenvalue ~0.97): most of the impact
    # deviation is gone by t=100 (the last periods bend toward the imposed
    # terminal condition — standard truncation behavior)
    dev0 = abs(traj.loc[0, "Y"] - ss["Y_ss"])
    dev100 = abs(traj.loc[100, "Y"] - ss["Y_ss"])
    assert dev100 < 0.25 * dev0


def test_perfect_foresight_matches_linear_irf_for_small_shock(rbc):
    """For a tiny shock the nonlinear path ~ linearized IRF."""
    from geconpy_tpu import impulse_response_function

    size = 1e-4
    res = solve_perfect_foresight(rbc, periods=80,
                                  shocks={"epsilon_A": np.array([size])})
    sol = rbc.solve_model(verbose=False)
    irf = impulse_response_function(sol, periods=20, shock_size=size)
    ss = rbc.steady_state(verbose=False).to_string()

    for t in range(10):
        nonlinear_dev = np.log(res.trajectory.loc[t, "Y"] / ss["Y_ss"])
        linear_dev = irf.loc[("epsilon_A", t), "Y"]
        np.testing.assert_allclose(nonlinear_dev, linear_dev, rtol=2e-2,
                                   atol=1e-9)


def test_permanent_shock(rbc):
    """Permanent productivity-relevant parameter change: path converges to
    the NEW steady state."""
    res = solve_perfect_foresight(
        rbc, periods=300, terminal_params={"delta": 0.025},
        initial_guess="linear")
    assert res.success
    ss_new = rbc.steady_state(verbose=False, delta=0.025).to_string()
    traj = res.trajectory
    np.testing.assert_allclose(traj.loc[300, "K"], ss_new["K_ss"], rtol=1e-8)
    np.testing.assert_allclose(traj.loc[280, "K"], ss_new["K_ss"], rtol=1e-3)
    # capital decumulates toward the lower new steady state
    ss_old = rbc.steady_state(verbose=False).to_string()
    assert ss_new["K_ss"] < ss_old["K_ss"]
    assert traj.loc[5, "K"] < ss_old["K_ss"]


def test_time_varying_parameter_path(rbc):
    """Announced temporary parameter change via param_paths: depreciation
    lowered for 20 periods, then back."""
    res = solve_perfect_foresight(
        rbc, periods=200, param_paths={"delta": np.concatenate(
            [np.full(20, 0.015), np.full(180, 0.02)])})
    assert res.success, res
    traj = res.trajectory
    ss = rbc.steady_state(verbose=False).to_string()
    # cheaper depreciation early on -> capital builds above SS then returns
    assert traj.loc[10, "K"] > ss["K_ss"]
    np.testing.assert_allclose(traj.loc[200, "K"], ss["K_ss"], rtol=1e-8)


# ---------------------------------------------------------------------------
# Brock-Mirman closed-form oracle: with log utility, Cobb-Douglas output and
# full depreciation the optimal savings rate is alpha*beta for ANY
# deterministic technology path (income and substitution effects cancel
# exactly), so the nonlinear perfect-foresight trajectory has the closed form
#     K[t] = alpha*beta * A[t] * K[t-1]^alpha
#     C[t] = (1-alpha*beta) * A[t] * K[t-1]^alpha
# — an exact anchor for the stacked-Newton solver and its timing conventions.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def brock_mirman():
    return model_from_gcn(str(DATA / "brock_mirman.gcn"))


def _bm_closed_form(eps_path, alpha=0.33, beta=0.96, rho=0.9, periods=None):
    """Exact deterministic path from the steady state under eps_path."""
    periods = periods or len(eps_path)
    K_ss = (alpha * beta) ** (1 / (1 - alpha))
    logA, K = 0.0, K_ss
    rows = []
    for t in range(periods):
        eps = eps_path[t] if t < len(eps_path) else 0.0
        logA = rho * logA + eps
        A = np.exp(logA)
        Y = A * K ** alpha
        K = alpha * beta * Y
        rows.append((A, Y, K, (1 - alpha * beta) * Y))
    return np.array(rows)  # columns A, Y, K, C


def test_brock_mirman_matches_closed_form(brock_mirman):
    eps = np.array([0.1, 0.0, -0.05])
    res = solve_perfect_foresight(brock_mirman, periods=120,
                                  shocks={"epsilon": eps})
    assert res.success
    ref = _bm_closed_form(eps, periods=120)
    traj = res.trajectory.iloc[1:-1]  # drop boundary rows
    np.testing.assert_allclose(traj["A"].to_numpy(), ref[:, 0], atol=1e-7)
    np.testing.assert_allclose(traj["Y"].to_numpy(), ref[:, 1], atol=1e-7)
    np.testing.assert_allclose(traj["K"].to_numpy(), ref[:, 2], atol=1e-7)
    np.testing.assert_allclose(traj["C"].to_numpy(), ref[:, 3], atol=1e-7)


def test_brock_mirman_anticipated_shock_no_leakage(brock_mirman):
    """A news shock at t=5 (known from t=0) must leave the path EXACTLY at
    the steady state until it hits: the constant-savings-rate closed form
    holds for anticipated paths too, so any pre-shock deviation means the
    solver leaks future information through a timing bug."""
    eps = np.zeros(8)
    eps[5] = 0.08
    res = solve_perfect_foresight(brock_mirman, periods=100,
                                  shocks={"epsilon": eps})
    assert res.success
    ref = _bm_closed_form(eps, periods=100)
    traj = res.trajectory.iloc[1:-1]
    K_ss = (0.33 * 0.96) ** (1 / (1 - 0.33))
    # flat at the steady state before the news arrives...
    np.testing.assert_allclose(traj["K"].to_numpy()[:5], K_ss, atol=1e-8)
    # ...and on the closed form afterwards (1e-6: Newton stops on the
    # residual at tol=1e-8; the path error passes through the Jacobian's
    # conditioning)
    np.testing.assert_allclose(traj["K"].to_numpy(), ref[:, 2], atol=1e-6)
    np.testing.assert_allclose(traj["C"].to_numpy(), ref[:, 3], atol=1e-6)


def test_krylov_direction_matches_direct():
    """direction='krylov' (matrix-free GMRES Newton step) reproduces the
    block-tridiagonal direct trajectory (reference: InexactNewtonKrylov,
    sparse_root/direction.py:124)."""
    import numpy as np

    import geconpy_tpu
    from geconpy_tpu import solve_perfect_foresight

    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc"),
                                       verbose=False)
    shocks = {"epsilon_A": np.array([0.02])}
    ref = solve_perfect_foresight(model, periods=80, shocks=shocks)
    got = solve_perfect_foresight(model, periods=80, shocks=shocks,
                                  direction="krylov")
    assert ref.success and got.success
    np.testing.assert_allclose(got.trajectory.to_numpy(),
                               ref.trajectory.to_numpy(),
                               rtol=1e-6, atol=1e-8)


def test_krylov_direction_long_horizon():
    """The factorization-free path converges on a long stacked-time system
    (T = 512) and lands on the terminal steady state."""
    import numpy as np

    import geconpy_tpu
    from geconpy_tpu import solve_perfect_foresight

    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("rbc"),
                                       verbose=False)
    res = solve_perfect_foresight(model, periods=512,
                                  shocks={"epsilon_A": np.array([0.02])},
                                  direction="krylov")
    assert res.success
    ss = model.steady_state(verbose=False).to_string()
    tail = res.trajectory.iloc[-1]
    np.testing.assert_allclose(tail["K"], ss["K_ss"], rtol=1e-6)
