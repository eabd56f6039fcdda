import pathlib

import pytest
import sympy as sp

from geconpy_tpu.lang.errors import GCNSemanticError
from geconpy_tpu.models.primitives import (
    load_gcn,
    load_gcn_file,
    propagate_steady_state_through_identities,
    system_to_steady_state,
)
from geconpy_tpu.symbolic import TimeAwareSymbol

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def rbc():
    return load_gcn_file(DATA / "rbc.gcn")


def test_rbc_primitives_square(rbc):
    assert len(rbc.equations) == len(rbc.variables)
    names = [v.base_name for v in rbc.variables]
    # U and TC eliminated by tryreduce; mc folded as a constant? mc=1 is an
    # identity - mc is removed by simplify_constants
    assert "U" not in names
    assert "TC" not in names
    assert "mc" not in names
    for expected in ["A", "C", "I", "K", "L", "Y", "lambda", "r", "w"]:
        assert expected in names


def test_rbc_shocks_and_params(rbc):
    assert [s.base_name for s in rbc.shocks] == ["epsilon_A"]
    params = {p.name: v for p, v in rbc.param_dict.items()}
    assert params == {
        "beta": 0.99, "delta": 0.02, "sigma_C": 1.5, "sigma_L": 2.0,
        "alpha": 0.35, "rho_A": 0.95,
    }


def test_rbc_ss_solution_complete(rbc):
    ss_names = {k.base_name for k in rbc.ss_solution_dict}
    var_names = {v.base_name for v in rbc.variables}
    assert var_names <= ss_names
    # all values are parameter-only expressions
    for expr in rbc.ss_solution_dict.values():
        assert not expr.atoms(TimeAwareSymbol)


def test_steady_state_system(rbc):
    ss_system = rbc.steady_state_system
    assert len(ss_system) == len(rbc.equations)
    for eq in ss_system:
        for atom in eq.atoms(TimeAwareSymbol):
            assert atom.time_index == "ss"


def test_ss_numeric_consistency(rbc):
    """The analytic steady state must zero the steady-state residuals."""
    subs = {p: v for p, v in rbc.param_dict.items()}
    ss_vals = {k: sp.simplify(v.subs(subs)) for k, v in rbc.ss_solution_dict.items()}
    full = {**{k: float(v) for k, v in ss_vals.items()}, **{p: float(v) for p, v in subs.items()}}
    for eq in rbc.steady_state_system:
        resid = float(eq.subs(full))
        assert abs(resid) < 1e-10, f"{eq} -> {resid}"


def test_extra_parameter_raises():
    src = """
    block B
    {
        identities { X[] = rho * X[-1] + undeclared_param * eps[]; };
        shocks { eps[]; };
        calibration { rho = 0.9; };
    };
    """
    with pytest.raises(GCNSemanticError) as err:
        load_gcn(src)
    assert err.value.code == "E102"


def test_orphan_parameter_raises():
    src = """
    block B
    {
        identities { X[] = rho * X[-1] + eps[]; };
        shocks { eps[]; };
        calibration { rho = 0.9; unused = 1.0; };
    };
    """
    with pytest.raises(GCNSemanticError) as err:
        load_gcn(src)
    assert err.value.code == "E103"
    # but tolerated when asked
    prims = load_gcn(src, on_unused_parameters="ignore")
    assert len(prims.equations) == 1


def test_deterministic_param_relations():
    src = """
    block B
    {
        identities { X[] = rho_fast * X[-1] + eps[]; };
        shocks { eps[]; };
        calibration { rho = 0.9; rho_fast = rho / 2; };
    };
    """
    prims = load_gcn(src)
    det = {k.name: v for k, v in prims.deterministic_dict.items()}
    assert "rho_fast" in det
    rho = sp.Symbol("rho", real=True)
    assert sp.simplify(det["rho_fast"] - rho / 2) == 0


def test_deep_lags_create_aux_chain():
    src = """
    block B
    {
        identities { X[] = a * X[-3] + eps[]; };
        shocks { eps[]; };
        calibration { a = 0.5; };
    };
    """
    prims = load_gcn(src)
    names = [v.base_name for v in prims.variables]
    assert "X__lag1" in names and "X__lag2" in names
    assert len(prims.equations) == 3


def test_calibrating_equation():
    src = """
    block B
    {
        identities { Y[] = K[-1] ^ alpha; K[] = s * Y[] + (1 - delta) * K[-1]; };
        calibration
        {
            delta = 0.02;
            s = 0.2;
            K[ss] / Y[ss] = 10.0 -> alpha;
        };
    };
    """
    prims = load_gcn(src)
    assert len(prims.calib_dict) == 1
    alpha = list(prims.calib_dict.keys())[0]
    assert alpha.name == "alpha"
    resid = prims.calib_dict[alpha]
    # residual references steady-state symbols
    assert all(a.time_index == "ss" for a in resid.atoms(TimeAwareSymbol))


def test_propagate_ss_through_identities():
    K_ss = TimeAwareSymbol("K", "ss", real=True)
    Y_ss = TimeAwareSymbol("Y", "ss", real=True)
    alpha = sp.Symbol("alpha", real=True)
    from geconpy_tpu.symbolic import SymbolDictionary

    ss_system = [Y_ss - K_ss**alpha, K_ss - 5]
    partial = SymbolDictionary({K_ss: sp.Integer(5)})
    full = propagate_steady_state_through_identities(ss_system, partial)
    assert sp.simplify(full[Y_ss] - 5**alpha) == 0
