import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.codegen.model_functions import build_model_functions
from geconpy_tpu.models.primitives import load_gcn, load_gcn_file
from geconpy_tpu.models.steady_state import make_steady_state_solver

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def rbc_mf():
    prims = load_gcn_file(DATA / "rbc.gcn")
    return prims, build_model_functions(prims)


@pytest.fixture(scope="module")
def rbc_numeric_mf():
    prims = load_gcn_file(DATA / "rbc_no_ss.gcn")
    return prims, build_model_functions(prims)


def _free_vector(mf, prims):
    values = {p.name: float(v) for p, v in prims.param_dict.items()}
    return jnp.array([values[p.name] for p in mf.free_params])


def test_analytic_ss(rbc_mf):
    prims, mf = rbc_mf
    assert mf.has_full_analytic_ss
    solve = make_steady_state_solver(mf)
    theta = _free_vector(mf, prims)
    sol = jax.jit(solve)(theta)
    assert bool(sol.success)
    assert float(sol.resid_norm) < 1e-10
    named = dict(zip(mf.variable_names, np.asarray(sol.x_ss)))
    # textbook RBC facts at these parameters
    assert abs(named["r"] - (1 / 0.99 - 0.98)) < 1e-12
    assert named["K"] > named["Y"] > named["C"] > named["I"] > 0


def test_numeric_ss_matches_analytic(rbc_mf, rbc_numeric_mf):
    prims_a, mf_a = rbc_mf
    prims_n, mf_n = rbc_numeric_mf
    assert not mf_n.has_full_analytic_ss
    assert mf_n.n_unknowns == mf_n.n_variables

    theta_a = _free_vector(mf_a, prims_a)
    theta_n = _free_vector(mf_n, prims_n)
    sol_a = make_steady_state_solver(mf_a)(theta_a)
    sol_n = jax.jit(make_steady_state_solver(mf_n))(theta_n)
    assert bool(sol_n.success), f"numeric SS failed: norm={sol_n.resid_norm}"

    a = dict(zip(mf_a.variable_names, np.asarray(sol_a.x_ss)))
    n = dict(zip(mf_n.variable_names, np.asarray(sol_n.x_ss)))
    for name in set(a) & set(n):
        np.testing.assert_allclose(a[name], n[name], rtol=1e-7, err_msg=name)


def test_numeric_ss_vmap(rbc_numeric_mf):
    """Batch of parameter draws solved in one vmapped call with flags."""
    prims, mf = rbc_numeric_mf
    theta0 = _free_vector(mf, prims)
    batch = jnp.stack([theta0, theta0 * 1.02, theta0 * 0.98])
    solve = jax.jit(jax.vmap(make_steady_state_solver(mf)))
    sols = solve(batch)
    assert sols.x_ss.shape == (3, mf.n_variables)
    assert bool(jnp.all(sols.success))


def test_ss_gradient_flows(rbc_mf):
    """d(SS values)/d(params) via the analytic path."""
    prims, mf = rbc_mf
    theta = _free_vector(mf, prims)
    solve = make_steady_state_solver(mf)

    def k_ss(th):
        return solve(th).x_ss[mf.variable_names.index("K")]

    g = jax.grad(k_ss)(theta)
    assert np.all(np.isfinite(np.asarray(g)))
    # K_ss rises with alpha (capital share)
    alpha_idx = [p.name for p in mf.free_params].index("alpha")
    assert float(g[alpha_idx]) > 0


def test_calibrating_equation_solved_with_ss():
    src = """
    assumptions { positive { Y[], K[], I[], alpha, delta, s; }; };
    block B
    {
        identities
        {
            Y[] = K[-1] ^ alpha;
            K[] = I[] + (1 - delta) * K[-1];
            I[] = s * Y[];
        };
        calibration
        {
            delta = 0.1;
            s = 0.2;
            K[ss] / Y[ss] = 2.0 -> alpha;
        };
    };
    """
    prims = load_gcn(src)
    mf = build_model_functions(prims)
    assert [p.name for p in mf.calibrated_params] == ["alpha"]
    solve = make_steady_state_solver(mf)
    theta = jnp.array([0.1, 0.2])  # delta, s
    sol = jax.jit(solve)(theta)
    assert bool(sol.success)
    named = dict(zip(mf.variable_names, np.asarray(sol.x_ss)))
    np.testing.assert_allclose(named["K"] / named["Y"], 2.0, rtol=1e-8)
    # K/Y = s/delta = 2.0 exactly at these params; alpha is then free to be
    # anything consistent: K = (sY), K^alpha: K/Y = s/delta -> check identity
    theta_full = np.asarray(sol.theta_full)
    alpha_val = theta_full[mf.param_names.index("alpha")]
    # steady state: Y = K^alpha, K/Y=2 -> K = 2*K^alpha -> alpha = 1 - log(2)/log(K)
    K = named["K"]
    np.testing.assert_allclose(K ** alpha_val, named["Y"], rtol=1e-8)


def test_fixed_values_consistent_and_inconsistent(rbc_numeric_mf):
    """User-pinned SS values: consistent pins solve; inconsistent pins fail."""
    from geconpy_tpu.models.model import Model

    prims, mf = rbc_numeric_mf
    model = Model(prims)
    free = model.steady_state(verbose=False)
    # pin L at its true value: same solution
    pinned = model.steady_state(verbose=False,
                                fixed_values={"L": free.to_string()["L_ss"]})
    assert pinned.success
    np.testing.assert_allclose(pinned.to_string()["K_ss"],
                               free.to_string()["K_ss"], rtol=1e-6)
    # pin L at a wrong value: full-system validation must flag failure
    bad = model.steady_state(verbose=False, fixed_values={"L": 2.5})
    assert not bad.success


def test_steady_state_method_selection():
    """Every root-finder in the family solves the RBC steady state
    end-to-end through Model.steady_state(method=...)."""
    from geconpy_tpu import get_example_gcn, model_from_gcn

    model = model_from_gcn(get_example_gcn("rbc_no_ss"), verbose=False)
    for method in ("newton", "newton_nm", "chord", "lm", "dogleg",
                   "gauss_newton", "hybrid"):
        ss = model.steady_state(method=method, verbose=False)
        assert ss.success, method
        assert ss.resid_norm < 1e-6, (method, ss.resid_norm)
