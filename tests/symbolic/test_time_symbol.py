import pickle

import sympy as sp

from geconpy_tpu.symbolic import (
    TimeAwareSymbol,
    SymbolDictionary,
    SteadyStateResults,
    diff_through_time,
    eq_to_ss,
    flatten_substitution_dict,
    step_equation_forward,
    step_equation_backward,
)


def test_rendering():
    C = TimeAwareSymbol("C", 0)
    assert C.name == "C_t"
    assert C.step_forward().name == "C_tp1"
    assert C.step_backward().name == "C_tm1"
    assert C.set_t(-3).name == "C_tm3"
    assert C.set_t(2).name == "C_tp2"
    assert C.to_ss().name == "C_ss"
    assert C.to_ss().to_ss().name == "C_ss"
    assert C.to_ss().exit_ss().name == "C_t"


def test_distinct_times_are_distinct_atoms():
    C0 = TimeAwareSymbol("C", 0)
    C1 = TimeAwareSymbol("C", 1)
    assert C0 != C1
    assert hash(C0) != hash(C1)
    expr = C0 + C1
    assert len(expr.free_symbols) == 2


def test_assumptions_preserved():
    K = TimeAwareSymbol("K", 0, positive=True)
    assert K.is_positive
    assert K.step_forward().is_positive
    assert sp.sqrt(K**2) == K  # needs positivity


def test_reconstruction_from_rendered_name():
    C = TimeAwareSymbol("C_tp2")
    assert C.base_name == "C"
    assert C.time_index == 2
    s = TimeAwareSymbol("x_leader_ss")
    assert s.base_name == "x_leader"
    assert s.time_index == "ss"


def test_pickle_roundtrip():
    K = TimeAwareSymbol("K", -1, positive=True)
    K2 = pickle.loads(pickle.dumps(K))
    assert K2 == K
    assert K2.base_name == "K"
    assert K2.time_index == -1
    assert K2.is_positive


def test_subs_and_diff():
    C = TimeAwareSymbol("C", 0)
    beta = sp.Symbol("beta")
    expr = sp.log(C) + beta * sp.log(C.step_forward())
    d = sp.diff(expr, C)
    assert d == 1 / C


def test_step_equation():
    C = TimeAwareSymbol("C", 0)
    K = TimeAwareSymbol("K", -1)
    eq = C + K - C.step_forward()
    f = step_equation_forward(eq)
    assert f == C.set_t(1) + K.set_t(0) - C.set_t(2)
    b = step_equation_backward(eq)
    assert b == C.set_t(-1) + K.set_t(-2) - C.set_t(0)


def test_eq_to_ss():
    C = TimeAwareSymbol("C", 0)
    K = TimeAwareSymbol("K", -1)
    beta = sp.Symbol("beta")
    eq = C**2 + beta * K
    ss = eq_to_ss(eq)
    assert ss == C.to_ss() ** 2 + beta * K.to_ss()


def test_diff_through_time_euler():
    # Canonical capital-accumulation Lagrangian term:
    #   L_t = lambda_t * ((1-delta) K_{t-1} + I_t - K_t)
    # dL/dK_t should pick up the current term (-lambda_t) and the
    # discounted t+1 term beta*lambda_{t+1}*(1-delta).
    lam = TimeAwareSymbol("lam", 0)
    K = TimeAwareSymbol("K", 0)
    I = TimeAwareSymbol("I", 0)
    beta, delta = sp.symbols("beta delta")
    L = lam * ((1 - delta) * K.step_backward() + I - K)
    dK = diff_through_time(L, K, discount=beta)
    expected = -lam + beta * lam.step_forward() * (1 - delta)
    assert sp.simplify(dK - expected) == 0


def test_diff_through_time_absent_symbol():
    lam = TimeAwareSymbol("lam", 0)
    X = TimeAwareSymbol("X", 0)
    assert diff_through_time(lam**2, X) == 0


def test_symbol_dictionary_roundtrip():
    C = TimeAwareSymbol("C", 0, positive=True)
    beta = sp.Symbol("beta", positive=True)
    d = SymbolDictionary({C: 1.5, beta: 0.99})
    s = d.to_string()
    assert s == {"C_t": 1.5, "beta": 0.99}
    back = s.to_sympy()
    keys = {k.name: k for k in back}
    assert keys["C_t"].is_positive
    assert isinstance(keys["C_t"], TimeAwareSymbol)
    assert keys["beta"].is_positive


def test_symbol_dictionary_time_ops():
    C = TimeAwareSymbol("C", 0)
    d = SymbolDictionary({C: 2.0}).to_ss()
    assert list(d.keys())[0].name == "C_ss"
    d2 = SymbolDictionary({C: 2.0}).step_forward()
    assert list(d2.keys())[0].name == "C_tp1"


def test_steady_state_results():
    C = TimeAwareSymbol("C", "ss")
    r = SteadyStateResults({C: 1.0}, success=True, resid_norm=1e-12)
    assert r.success
    r2 = pickle.loads(pickle.dumps(r))
    assert r2.success and r2[C] == 1.0


def test_flatten_substitution_dict():
    a, b, c = sp.symbols("a b c")
    d = {a: b + 1, b: c * 2}
    flat = flatten_substitution_dict(d)
    assert flat[a] == 2 * c + 1
    assert flat[b] == 2 * c
