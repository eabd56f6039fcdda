"""Hand-derived linearization cases: exact A/B/C/D entries, loglin chain
rule and fallbacks, coordinate-change invariance of the policy solution,
and the gEcon P/Q/R/S partition on a fully hand-solvable model.

Role parity with the reference's perturbation tests
(gEconpy tests/model/test_perturbation.py): entries are checked against
values derived on paper, not against another code path.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"

MINI_GCN = """
block TEST
{
    identities
    {
        log(A[]) = rho * log(A[-1]) + epsilon_A[];
        Y[] = A[] ^ alpha;
    };
    shocks
    {
        epsilon_A[];
    };
    calibration
    {
        rho = 0.9;
        alpha = 0.3;
    };
};
"""


@pytest.fixture(scope="module")
def mini():
    return model_from_gcn(MINI_GCN, verbose=False)


def _lin(model, loglin="auto"):
    sol = jax.jit(model.ss_solver)(model.default_theta())
    assert bool(sol.success)
    lin = jax.jit(model.linearizer(loglin))(sol.x_ss, sol.theta_full)
    return sol, lin


def test_mini_model_abcd_by_hand(mini):
    """A_t = A_{t-1}^rho e^eps, Y = A^alpha around A_ss = Y_ss = 1.

    In log deviations (scale = SS = 1):
      e1:  a_t - rho a_{t-1} - eps = 0
      e2:  y_t - alpha a_t       = 0   (rows may carry an overall sign/scale
                                        from the residual convention, so each
                                        row is compared up to normalization)
    """
    rho, alpha = 0.9, 0.3
    sol, lin = _lin(mini)
    names = mini.functions.variable_names
    iA, iY = names.index("A"), names.index("Y")
    A, B, C, D = (np.asarray(m) for m in (lin.A, lin.B, lin.C, lin.D))
    np.testing.assert_allclose(np.asarray(lin.loglin_scale), 1.0, atol=1e-9)
    np.testing.assert_allclose(C, 0.0, atol=1e-9)   # no leads anywhere

    # identify the technology row: it is the only row with lag dependence
    lag_rows = np.flatnonzero(np.abs(A).max(axis=1) > 1e-12)
    assert len(lag_rows) == 1
    r1 = lag_rows[0]
    r2 = 1 - r1
    # row 1 (normalize by the a_t coefficient): a_t - rho a_{t-1} - eps
    c = B[r1, iA]
    assert abs(c) > 1e-12
    np.testing.assert_allclose(B[r1, iY] / c, 0.0, atol=1e-9)
    np.testing.assert_allclose(A[r1, iA] / c, -rho, rtol=1e-7)
    np.testing.assert_allclose(D[r1, 0] / c, -1.0, rtol=1e-7)
    # row 2 (normalize by the y_t coefficient): y_t - alpha a_t
    c2 = B[r2, iY]
    assert abs(c2) > 1e-12
    np.testing.assert_allclose(B[r2, iA] / c2, -alpha, rtol=1e-7)
    np.testing.assert_allclose(A[r2], 0.0, atol=1e-9)
    np.testing.assert_allclose(D[r2, 0] / c2, 0.0, atol=1e-9)


def test_mini_model_policy_by_hand(mini):
    """The solved policy is a_t = rho a_{t-1} + eps, y_t = alpha a_t."""
    rho, alpha = 0.9, 0.3
    sol = mini.solve_model(verbose=False)
    names = mini.functions.variable_names
    iA, iY = names.index("A"), names.index("Y")
    T = np.asarray(sol.T)
    R = np.asarray(sol.R)
    expected_T = np.zeros((2, 2))
    expected_T[iA, iA] = rho
    expected_T[iY, iA] = alpha * rho
    expected_R = np.zeros((2, 1))
    expected_R[iA, 0] = 1.0
    expected_R[iY, 0] = alpha
    np.testing.assert_allclose(T, expected_T, atol=1e-9)
    np.testing.assert_allclose(R, expected_R, atol=1e-9)


def test_gecon_partition_by_hand(mini):
    """P/Q/R/S on the hand-solved mini model: A is the only state."""
    from geconpy_tpu.models.perturbation import gecon_matrices

    rho, alpha = 0.9, 0.3
    sol = mini.solve_model(verbose=False)
    names = mini.functions.variable_names
    iA = names.index("A")
    P, Q, R_out, S, state_idx, jump_idx = gecon_matrices(
        sol.T, sol.R, names)
    assert list(state_idx) == [iA]
    np.testing.assert_allclose(P, [[rho]], atol=1e-9)
    np.testing.assert_allclose(Q, [[1.0]], atol=1e-9)
    np.testing.assert_allclose(R_out, [[alpha * rho]], atol=1e-9)
    np.testing.assert_allclose(S, [[alpha]], atol=1e-9)


def test_loglin_fallback_on_nonpositive_ss():
    """A variable with a negative steady state falls back to level
    deviations (scale 1) even when log-linearization is requested."""
    gcn = MINI_GCN.replace(
        "Y[] = A[] ^ alpha;",
        "Y[] = A[] ^ alpha;\n        X[] = Y[] - 2;")
    model = model_from_gcn(gcn, verbose=False)
    sol, lin = _lin(model, loglin=True)
    names = model.functions.variable_names
    scale = np.asarray(lin.loglin_scale)
    assert float(np.asarray(sol.x_ss)[names.index("X")]) == pytest.approx(-1.0)
    assert scale[names.index("X")] == 1.0          # fallback
    assert scale[names.index("Y")] == pytest.approx(1.0)  # Y_ss = 1


def test_loglin_mask_errors_and_selection(mini):
    from geconpy_tpu.models.perturbation import make_loglin_mask

    mf = mini.functions
    np.testing.assert_array_equal(make_loglin_mask(mf, True),
                                  [True] * mf.n_variables)
    np.testing.assert_array_equal(make_loglin_mask(mf, False),
                                  [False] * mf.n_variables)
    mask = make_loglin_mask(mf, ["Y"])
    names = mf.variable_names
    assert mask[names.index("Y")] and not mask[names.index("A")]
    with pytest.raises(ValueError, match="NOPE"):
        make_loglin_mask(mf, ["NOPE"])


def test_policy_invariant_under_loglin_coordinate_change():
    """Log- and level-linearized solutions are the same dynamical system in
    different coordinates: T_level = S T_log S^-1 and R_level = S R_log
    with S = diag(x_ss).  A strong end-to-end check of the chain-rule
    scaling through the full solve."""
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    sol_log = model.solve_model(verbose=False)                 # loglin auto
    sol_lvl = model.solve_model(loglin_variables=[], verbose=False)
    x_ss = np.asarray(jax.jit(model.ss_solver)(model.default_theta()).x_ss)
    S = np.diag(x_ss)
    T_log = np.asarray(sol_log.T)
    T_lvl = np.asarray(sol_lvl.T)
    R_log = np.asarray(sol_log.R)
    R_lvl = np.asarray(sol_lvl.R)
    np.testing.assert_allclose(T_lvl, S @ T_log @ np.linalg.inv(S),
                               atol=1e-7 * np.abs(T_lvl).max())
    np.testing.assert_allclose(R_lvl, S @ R_log,
                               atol=1e-7 * np.abs(R_lvl).max())
