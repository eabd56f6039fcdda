"""Steady-state machinery depth tests against a hand-derived closed form.

A one-sector growth model written inline (own notation/calibration) whose
steady state is fully analytic:

    Euler:  1 = betta * (alpha * K^(alpha-1) + 1 - delta)
    =>      K* = (alpha * betta / (1 - betta * (1 - delta)))^(1/(1-alpha))
            Y* = K*^alpha,  C* = Y* - delta * K*,  lam* = 1/C*,
            V* = log(C*) / (1 - betta)

Covers the numeric-solver waterfall, implicit-adjoint gradients, calibrating
equations, user-pinned values, method agreement, vmapped batching, and
failure-as-flags.  Coverage model: the reference's
``gEconpy/tests/model/test_steady_state.py`` (612 LoC), cases hand-derived.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.codegen.model_functions import build_model_functions
from geconpy_tpu.models.primitives import load_gcn
from geconpy_tpu.models.steady_state import (
    make_fixed_value_solver,
    make_steady_state_solver,
)

GROWTH_GCN = """
assumptions
{
    positive { A[], C[], K[], Y[], lam[], alpha, betta, delta; };
};

block AGENT
{
    controls { C[], K[]; };
    objective { V[] = log(C[]) + betta * E[][V[1]]; };
    constraints
    {
        C[] + K[] = A[] * K[-1] ^ alpha + (1 - delta) * K[-1] : lam[];
    };
    identities { Y[] = A[] * K[-1] ^ alpha; };
    calibration { betta = 0.985; delta = 0.03; alpha = 0.4; };
};

block SHOCK
{
    identities { log(A[]) = rho * log(A[-1]) + e_A[]; };
    shocks { e_A[]; };
    calibration { rho = 0.9; };
};
"""

# same model, alpha backed out from a capital/output calibration target
GROWTH_CALIB_GCN = GROWTH_GCN.replace(
    "calibration { betta = 0.985; delta = 0.03; alpha = 0.4; };",
    """calibration
    {
        betta = 0.985;
        delta = 0.03;
        kap = 9.0;
        K[ss] / Y[ss] = kap -> alpha;
    };""",
)


def closed_form(betta, delta, alpha):
    K = (alpha * betta / (1.0 - betta * (1.0 - delta))) ** (1.0 / (1.0 - alpha))
    Y = K ** alpha
    C = Y - delta * K
    return {"A": 1.0, "K": K, "Y": Y, "C": C, "lam": 1.0 / C,
            "V": np.log(C) / (1.0 - betta)}


@pytest.fixture(scope="module")
def growth():
    prims = load_gcn(GROWTH_GCN)
    mf = build_model_functions(prims)
    values = {p.name: float(v) for p, v in prims.param_dict.items()}
    theta = jnp.array([values[p.name] for p in mf.free_params])
    return prims, mf, theta, values


def named_ss(mf, sol):
    return dict(zip(mf.variable_names, np.asarray(sol.x_ss)))


def test_numeric_ss_matches_closed_form(growth):
    _, mf, theta, values = growth
    sol = jax.jit(make_steady_state_solver(mf))(theta)
    assert bool(sol.success)
    got = named_ss(mf, sol)
    want = closed_form(values["betta"], values["delta"], values["alpha"])
    for name, v in want.items():
        assert got[name] == pytest.approx(v, rel=1e-8), name


def test_euler_capital_gradient_vs_closed_form(growth):
    """d K*/d theta through the implicit-function adjoint must match the
    closed-form derivative (central finite difference of the formula)."""
    _, mf, theta, values = growth
    solve = make_steady_state_solver(mf)
    k_idx = mf.variable_names.index("K")

    def k_star(th):
        return solve(th)[0][k_idx]

    grad = np.asarray(jax.grad(k_star)(theta))
    h = 1e-6
    for pname in ("betta", "delta", "alpha"):
        p_idx = [p.name for p in mf.free_params].index(pname)
        args = dict(values)

        def k_formula(v, _name=pname, _args=args):
            a = dict(_args)
            a[_name] = v
            return closed_form(a["betta"], a["delta"], a["alpha"])["K"]

        fd = (k_formula(values[pname] + h) - k_formula(values[pname] - h)) / (2 * h)
        assert grad[p_idx] == pytest.approx(fd, rel=1e-5), pname


def test_calibrating_equation_backs_out_alpha():
    prims = load_gcn(GROWTH_CALIB_GCN)
    mf = build_model_functions(prims)
    assert [p.name for p in mf.calibrated_params] == ["alpha"]
    values = {p.name: float(v) for p, v in prims.param_dict.items()}
    theta = jnp.array([values[p.name] for p in mf.free_params])
    sol = jax.jit(make_steady_state_solver(mf))(theta)
    assert bool(sol.success)
    # K/Y = alpha*betta / (1 - betta(1-delta))  =>  alpha = kap * (...)/betta
    betta, delta, kap = values["betta"], values["delta"], values["kap"]
    alpha_expected = kap * (1.0 - betta * (1.0 - delta)) / betta
    alpha_solved = float(sol.theta_full[-1])      # calibrated params sit last
    assert alpha_solved == pytest.approx(alpha_expected, rel=1e-8)
    got = named_ss(mf, sol)
    assert got["K"] / got["Y"] == pytest.approx(kap, rel=1e-8)
    # and the rest of the steady state is the closed form at solved alpha
    want = closed_form(betta, delta, alpha_expected)
    assert got["C"] == pytest.approx(want["C"], rel=1e-8)


@pytest.mark.parametrize("method", ["newton", "lm", "dogleg", "hybrid"])
def test_solver_methods_agree(growth, method):
    _, mf, theta, values = growth
    sol = make_steady_state_solver(mf, method=method)(theta)
    assert bool(sol.success), method
    want = closed_form(values["betta"], values["delta"], values["alpha"])
    # LM stops at its gradient-based criterion, slightly looser than Newton
    assert named_ss(mf, sol)["K"] == pytest.approx(want["K"], rel=1e-5)


def test_vmapped_batch_of_parameter_draws(growth):
    _, mf, theta, values = growth
    solve = make_steady_state_solver(mf)
    b_idx = [p.name for p in mf.free_params].index("betta")
    bettas = np.linspace(0.95, 0.995, 8)
    thetas = jnp.tile(theta[None, :], (8, 1)).at[:, b_idx].set(bettas)
    sols = jax.jit(jax.vmap(solve))(thetas)
    assert bool(jnp.all(sols.success))
    k_idx = mf.variable_names.index("K")
    for i, b in enumerate(bettas):
        want = closed_form(b, values["delta"], values["alpha"])["K"]
        assert float(sols.x_ss[i, k_idx]) == pytest.approx(want, rel=1e-7)


def test_infeasible_parameters_flag_not_raise(growth):
    """betta > 1 has no interior steady state: the solver must return
    success=False (vmap/MCMC safety), never raise."""
    _, mf, theta, _ = growth
    b_idx = [p.name for p in mf.free_params].index("betta")
    bad = theta.at[b_idx].set(1.02)
    sol = jax.jit(make_steady_state_solver(mf))(bad)
    assert not bool(sol.success)


def test_fixed_value_solver_consistent_pin(growth):
    _, mf, theta, values = growth
    want = closed_form(values["betta"], values["delta"], values["alpha"])
    solve = make_fixed_value_solver(mf, ["K"])
    sol = jax.jit(solve)(theta, jnp.array([want["K"]]))
    assert bool(sol.success)
    got = named_ss(mf, sol)
    assert got["C"] == pytest.approx(want["C"], rel=1e-6)
    assert got["K"] == want["K"]


def test_fixed_value_solver_inconsistent_pin_fails(growth):
    _, mf, theta, values = growth
    want = closed_form(values["betta"], values["delta"], values["alpha"])
    solve = make_fixed_value_solver(mf, ["K"])
    sol = jax.jit(solve)(theta, jnp.array([2.0 * want["K"]]))
    assert not bool(sol.success)


def test_fixed_value_solver_unknown_name_raises(growth):
    _, mf, _, _ = growth
    with pytest.raises(KeyError):
        make_fixed_value_solver(mf, ["Kapital"])


def test_x0_override_reaches_same_root(growth):
    _, mf, theta, values = growth
    solve = make_steady_state_solver(mf)
    n_u = len(mf.unknown_idx) + len(mf.calibrated_params)
    sol = solve(theta, x0=jnp.full((n_u,), 3.0))
    assert bool(sol.success)
    want = closed_form(values["betta"], values["delta"], values["alpha"])
    assert named_ss(mf, sol)["K"] == pytest.approx(want["K"], rel=1e-7)


def test_residual_norm_is_full_system(growth):
    """resid_norm validates ALL equations, not just the solved subset."""
    _, mf, theta, _ = growth
    sol = make_steady_state_solver(mf)(theta)
    r = mf.f_ss_resid(sol.x_ss, sol.theta_full)
    assert float(jnp.max(jnp.abs(r))) == pytest.approx(float(sol.resid_norm),
                                                       abs=1e-12)
    assert float(sol.resid_norm) < 1e-7
