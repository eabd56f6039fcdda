"""Hand-derived assertions on the state-space construction itself.

Every test here checks the *matrices* (Z, d, H, Q, T_aug, R_aug) entry by
entry against expectations derived by hand from the model's steady state and
the documented conventions, rather than only asserting a finite likelihood.

Role parity with the reference's design-matrix tests
(gEconpy tests/model/test_statespace.py — observation-equation Z rows checked
against analytical expectations around :904).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def model():
    return model_from_gcn(str(DATA / "rbc_estimation.gcn"))


def _solve(ss):
    u = ss.initial_position()
    return jax.jit(ss.build_solution_fn(full_state=True))(u)


def _names(model):
    return model.functions.variable_names


# ------------------------------------------------------------------ Z and d
def test_direct_observable_unit_row_and_intercept(model):
    """A directly-observed log-linearized variable loads 1.0 on its own
    state column (the state IS the log-deviation), and the SS intercept is
    log(v_ss) when ss_obs_intercept=True — data in logs (reference parity:
    gEconpy/model/statespace.py:334 _make_obs_intercept)."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y", "C"], measurement_error={"Y": 0.1, "C": 0.1},
        ss_obs_intercept=True)
    sol = _solve(ss)
    names = _names(model)
    n = len(names)
    Z = np.asarray(sol["Z"])
    assert Z.shape == (2, n)
    for row, obs in enumerate(["Y", "C"]):
        expected = np.zeros(n)
        expected[names.index(obs)] = 1.0
        np.testing.assert_allclose(Z[row], expected, atol=0)
    x_ss = np.asarray(sol["x_ss"])
    np.testing.assert_allclose(
        np.asarray(sol["d"]),
        np.log([x_ss[names.index("Y")], x_ss[names.index("C")]]), rtol=1e-12)


def test_direct_observable_level_intercept_when_not_loglin(model):
    """With loglin_variables=[] (pure level linearization) the intercept is
    the steady-state level itself."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y"], measurement_error={"Y": 0.1},
        loglin_variables=[], constant_params=["alpha", "sigma_C"],
        ss_obs_intercept=True)
    sol = _solve(ss)
    names = _names(model)
    x_ss = np.asarray(sol["x_ss"])
    np.testing.assert_allclose(np.asarray(sol["d"]),
                               [x_ss[names.index("Y")]], rtol=1e-12)


def test_intercept_zero_when_disabled(model):
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y"], constant_params=["alpha", "sigma_C"])
    sol = _solve(ss)
    np.testing.assert_array_equal(np.asarray(sol["d"]), [0.0])


def test_growth_rate_coefficients_are_loglin_scaled(model):
    """dY = Y[] - Y[-1]: the exact jacfwd coefficient on the current block
    is +Y_ss (chain rule through the log-deviation state, Y_ss > 0 so the
    loglin scale is Y_ss), on the lag block -Y_ss, zero elsewhere; the SS
    intercept Y_ss - Y_ss vanishes."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["dY"], observation_equations={"dY": "Y[] - Y[-1]"},
        measurement_error={"dY": 0.01},
        constant_params=["alpha", "sigma_C"], ss_obs_intercept=True)
    sol = _solve(ss)
    names = _names(model)
    n = len(names)
    iY = names.index("Y")
    Y_ss = float(np.asarray(sol["x_ss"])[iY])
    Z = np.asarray(sol["Z"])
    assert Z.shape == (1, 2 * n)
    expected = np.zeros(2 * n)
    expected[iY] = Y_ss
    expected[n + iY] = -Y_ss
    np.testing.assert_allclose(Z[0], expected, atol=1e-9 * Y_ss)
    np.testing.assert_allclose(np.asarray(sol["d"]), [0.0], atol=1e-12)


def test_aggregation_sum_design(model):
    """Y_q = Y[] + Y[-1] + Y[-2]: Y_ss on each of the three lag blocks,
    intercept 3*Y_ss."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y_q"], aggregate={"Y_q": ("Y", "sum", 3)},
        measurement_error={"Y_q": 0.01},
        constant_params=["alpha", "sigma_C"], ss_obs_intercept=True)
    assert ss._obs_max_lag == 2
    sol = _solve(ss)
    names = _names(model)
    n = len(names)
    iY = names.index("Y")
    Y_ss = float(np.asarray(sol["x_ss"])[iY])
    expected = np.zeros(3 * n)
    for j in range(3):
        expected[j * n + iY] = Y_ss
    np.testing.assert_allclose(np.asarray(sol["Z"])[0], expected,
                               atol=1e-9 * Y_ss)
    np.testing.assert_allclose(np.asarray(sol["d"]), [3 * Y_ss], rtol=1e-9)


def test_aggregation_mean_first_last_design(model):
    """mean/first/last aggregation place Y_ss/period (resp. a single Y_ss)
    on exactly the documented lag blocks."""
    cases = {
        "mean": (2, {0: 0.5, 1: 0.5}),   # (Y[] + Y[-1]) / 2
        "first": (3, {2: 1.0}),          # Y[-2]
        "last": (3, {0: 1.0}),           # Y[]
    }
    names = _names(model)
    n = len(names)
    iY = names.index("Y")
    for method, (period, blocks) in cases.items():
        ss = DSGEStateSpace(model).configure(
            observed_states=["Y_q"], aggregate={"Y_q": ("Y", method, period)},
            measurement_error={"Y_q": 0.01},
            constant_params=["alpha", "sigma_C"], ss_obs_intercept=True)
        sol = _solve(ss)
        Y_ss = float(np.asarray(sol["x_ss"])[iY])
        L = ss._obs_max_lag
        expected = np.zeros((L + 1) * n)
        for j, w in blocks.items():
            expected[j * n + iY] = w * Y_ss
        np.testing.assert_allclose(np.asarray(sol["Z"])[0], expected,
                                   atol=1e-9 * Y_ss, err_msg=method)
        np.testing.assert_allclose(
            np.asarray(sol["d"]), [sum(blocks.values()) * Y_ss], rtol=1e-9,
            err_msg=method)


def test_mixed_direct_and_lagged_observables(model):
    """When one observable needs a lag block, direct observables still load
    only on the current block."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["C", "dY"],
        observation_equations={"dY": "Y[] - Y[-1]"},
        measurement_error={"C": 0.01, "dY": 0.01},
        constant_params=["alpha", "sigma_C"])
    sol = _solve(ss)
    names = _names(model)
    n = len(names)
    Z = np.asarray(sol["Z"])
    assert Z.shape == (2, 2 * n)
    expected_C = np.zeros(2 * n)
    expected_C[names.index("C")] = 1.0
    np.testing.assert_allclose(Z[0], expected_C, atol=0)


# ------------------------------------------------- companion lag augmentation
def test_lag_augmentation_companion_structure(model):
    """T_aug is the companion form: policy in the leading block, identity
    shift registers below the diagonal, zeros elsewhere; R_aug loads shocks
    only into the current block."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y_q"], aggregate={"Y_q": ("Y", "sum", 3)},
        measurement_error={"Y_q": 0.01},
        constant_params=["alpha", "sigma_C"])
    sol = _solve(ss)
    n = len(_names(model))
    T_aug = np.asarray(sol["T_aug"])
    R_aug = np.asarray(sol["R_aug"])
    T = np.asarray(sol["T"])
    assert T_aug.shape == (3 * n, 3 * n)
    np.testing.assert_allclose(T_aug[:n, :n], T, atol=1e-12)
    np.testing.assert_array_equal(T_aug[:n, n:], np.zeros((n, 2 * n)))
    np.testing.assert_array_equal(T_aug[n:2 * n, :n], np.eye(n))
    np.testing.assert_array_equal(T_aug[2 * n:, n:2 * n], np.eye(n))
    np.testing.assert_array_equal(T_aug[n:2 * n, n:], np.zeros((n, 2 * n)))
    np.testing.assert_allclose(R_aug[:n], np.asarray(sol["R"]), atol=1e-12)
    np.testing.assert_array_equal(R_aug[n:], np.zeros((2 * n, 1)))


# --------------------------------------------------------------- H and Q
def test_fixed_measurement_error_H(model):
    """Fixed measurement stds enter H as exact squared diagonals, in
    observed-state order."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y", "C"],
        measurement_error={"Y": 0.1, "C": 0.2})
    sol = _solve(ss)
    np.testing.assert_allclose(np.asarray(sol["H"]),
                               np.diag([0.01, 0.04]), rtol=1e-12)


def test_estimated_measurement_error_H(model):
    """An estimated measurement std lands on the right H diagonal entry,
    equal to the square of its constrained parameter value."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y", "C"],
        measurement_error={"Y": 0.1, "C": ss_me_prior()})
    u = ss.initial_position()
    sol = jax.jit(ss.build_solution_fn(full_state=True))(u)
    x = np.asarray(ss.constrain(u))
    sigma_obs_C = x[ss.param_labels.index("sigma_obs_C")]
    H = np.asarray(sol["H"])
    np.testing.assert_allclose(H[0, 0], 0.01, rtol=1e-12)
    np.testing.assert_allclose(H[1, 1], sigma_obs_C**2, rtol=1e-9)
    assert H[0, 1] == H[1, 0] == 0.0


def ss_me_prior():
    from geconpy_tpu.dists import HalfNormal

    return HalfNormal(sigma=0.05)


def test_q_from_hyperparameter_link(model):
    """epsilon_A ~ Normal(mu=0, sigma=sigma_A) links the shock variance to
    the model parameter sigma_A: Q == [[sigma_A**2]] at the draw's value."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y"], constant_params=["alpha", "sigma_C"])
    u = ss.initial_position()
    sol = jax.jit(ss.build_solution_fn(full_state=True))(u)
    free_names = [p.name for p in model.functions.free_params]
    sigma_A = float(np.asarray(sol["theta_full"])[free_names.index("sigma_A")])
    np.testing.assert_allclose(np.asarray(sol["Q"]), [[sigma_A**2]],
                               rtol=1e-9)
    assert sigma_A > 0


def test_q_fixed_shock_std_override():
    """Without a shock prior, shock_std fixes the std (dict and scalar)."""
    model = model_from_gcn(str(DATA / "rbc.gcn"), verbose=False)
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y"], shock_std={"epsilon_A": 0.03},
        constant_params=model.param_names)
    sol = _solve(ss)
    np.testing.assert_allclose(np.asarray(sol["Q"]), [[0.03**2]], rtol=1e-12)


# ------------------------------------------------------- filter-state units
def test_observation_reconstruction_roundtrip(model):
    """End-to-end unit consistency between the three observation flavors:
    the directly-observed log series, a LEVEL first-difference observation
    equation (coefficients Y_ss via the loglin chain rule), and a LOG
    first-difference observation equation (coefficients exactly +-1).  The
    simulated columns must satisfy the exact linear identities relating
    them."""
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y", "dY", "dlY"],
        observation_equations={"dY": "Y[] - Y[-1]",
                               "dlY": "log(Y[]) - log(Y[-1])"},
        measurement_error={"Y": 1e-8, "dY": 1e-8, "dlY": 1e-8},
        constant_params=["alpha", "sigma_C"], ss_obs_intercept=True)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=50)
    data = np.asarray(data)
    sol = jax.jit(ss.build_solution_fn(full_state=True))(
        ss.unconstrain(draw))
    names = _names(model)
    n = len(names)
    iY = names.index("Y")
    Y_ss = float(np.asarray(sol["x_ss"])[iY])
    # log-diff obs-eq coefficients are exactly +1 / -1 (scale cancels)
    Z = np.asarray(sol["Z"])
    np.testing.assert_allclose(Z[2, iY], 1.0, rtol=1e-9)
    np.testing.assert_allclose(Z[2, n + iY], -1.0, rtol=1e-9)
    # observed log level hovers around log(Y_ss)
    assert abs(data[:, 0].mean() - np.log(Y_ss)) < 0.5
    # log-diff column == first difference of the log-level column
    np.testing.assert_allclose(data[1:, 2], np.diff(data[:, 0]), atol=1e-6)
    # level-diff column == Y_ss * log-diff column (first-order chain rule)
    np.testing.assert_allclose(data[1:, 1], Y_ss * data[1:, 2], atol=1e-6)
