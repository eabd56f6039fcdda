"""Dynare-export content matrix: structural validity of the generated .mod
source across the model library (role: ``gEconpy/dynare_convert.py:243``
``make_mod_file``; the reference's tests assert block structure per model).
"""

import re

import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, make_mod_file, model_from_gcn

MODELS = ["rbc", "nk_3eq", "brock_mirman", "open_rbc", "burnside"]

_CACHE = {}


def _model(name):
    if name not in _CACHE:
        _CACHE[name] = model_from_gcn(get_example_gcn(name), verbose=False)
    return _CACHE[name]


@pytest.mark.parametrize("name", MODELS)
def test_mod_declares_every_symbol(name):
    model = _model(name)
    mod = make_mod_file(model)
    var_line = re.search(r"var ([^;]+);", mod).group(1)
    declared = {v.strip() for v in var_line.split(",")}
    assert declared == set(model.functions.variable_names), name
    exo_line = re.search(r"varexo ([^;]+);", mod).group(1)
    assert {v.strip() for v in exo_line.split(",")} \
        == set(model.functions.shock_names), name
    par_line = re.search(r"parameters ([^;]+);", mod).group(1)
    declared_params = {v.strip() for v in par_line.split(",")}
    # every declared parameter gets a numeric assignment before the model
    head = mod.split("model;")[0]
    for p in declared_params:
        assert re.search(rf"^{re.escape(p)} = [-0-9.eE+]+;", head,
                         re.MULTILINE), (name, p)


@pytest.mark.parametrize("name", MODELS)
def test_mod_equation_count_and_timing(name):
    model = _model(name)
    mod = make_mod_file(model)
    body = mod.split("model;")[1].split("end;")[0]
    eqs = [ln for ln in body.splitlines() if ln.strip()]
    assert len(eqs) == len(model.primitives.equations), name
    # no gEconpy-style time brackets survive
    assert "[" not in body and "]" not in body, name


@pytest.mark.parametrize("name", MODELS)
def test_steady_state_model_covers_every_variable(name):
    model = _model(name)
    mod = make_mod_file(model)
    if "steady_state_model;" not in mod:
        # models without a full analytic SS fall back to numeric initval
        assert "initval;" in mod and "steady;" in mod, name
        sect = mod.split("initval;")[1].split("end;")[0]
        assigned = {m.group(1) for m in
                    re.finditer(r"^\s*([A-Za-z_]\w*)\s*=", sect,
                                re.MULTILINE)}
        assert not (set(model.functions.variable_names) - assigned), name
        return
    sect = mod.split("steady_state_model;")[1].split("end;")[0]
    assigned = {m.group(1) for m in
                re.finditer(r"^\s*([A-Za-z_]\w*)\s*=", sect, re.MULTILINE)}
    missing = set(model.functions.variable_names) - assigned
    assert not missing, (name, missing)


@pytest.mark.parametrize("name", MODELS)
def test_steady_state_model_evaluates_to_the_actual_ss(name):
    """Execute the emitted steady_state_model block as Python (the emitted
    arithmetic is language-neutral apart from ^) — the assignments must
    reproduce the model's own steady state, CSE temps included."""
    model = _model(name)
    mod = make_mod_file(model)
    if "steady_state_model;" not in mod:
        pytest.skip(f"{name}: no analytic SS — numeric initval fallback "
                    "(covered by test_steady_state_model_covers_every_variable)")
    sect = mod.split("steady_state_model;")[1].split("end;")[0]
    head = mod.split("model;")[0]
    env = {"log": np.log, "exp": np.exp, "sqrt": np.sqrt, "abs": np.abs}
    for m in re.finditer(r"^([A-Za-z_]\w*) = ([-0-9.eE+]+);", head,
                         re.MULTILINE):
        env[m.group(1)] = float(m.group(2))
    for ln in sect.splitlines():
        ln = ln.strip().rstrip(";")
        if not ln:
            continue
        lhs, rhs = ln.split("=", 1)
        env[lhs.strip()] = eval(  # noqa: S307 — our own generated source
            rhs.strip().replace("^", "**"), {"__builtins__": {}}, env)
    ss = _model(name).steady_state(verbose=False).to_string()
    for var in model.functions.variable_names:
        np.testing.assert_allclose(env[var], ss[f"{var}_ss"], rtol=1e-6,
                                   atol=1e-10, err_msg=(name, var))


def test_shock_block_stderr_per_shock():
    model = _model("rbc")
    mod = make_mod_file(model, shock_std={"epsilon_A": 0.02})
    sect = mod.split("shocks;")[1].split("end;")[0]
    assert re.search(r"var epsilon_A;\s*stderr 0\.02", sect)


def test_stoch_simul_options_respected():
    model = _model("rbc")
    mod = make_mod_file(model, periods=500, order=2)
    assert re.search(r"stoch_simul\(order\s*=\s*2.*periods\s*=\s*500", mod) \
        or re.search(r"stoch_simul\(.*order\s*=\s*2", mod), mod.splitlines()[-2:]
