"""Time-shift / Lagrangian algebra unit tests.

Covers geconpy_tpu/symbolic/algebra.py — role parity with the reference's
gEconpy/utilities.py (step_equation_* :67/:76, diff_through_time :85,
eq_to_ss :42, flatten_substitution_dict :265).
"""

import pytest
import sympy as sp

from geconpy_tpu.symbolic import TimeAwareSymbol
from geconpy_tpu.symbolic.algebra import (
    diff_through_time,
    eq_to_ss,
    expand_subs_for_all_times,
    flatten_substitution_dict,
    step_equation_backward,
    step_equation_forward,
    substitute_all_equations,
)


def V(name, t, **a):
    return TimeAwareSymbol(name, t, real=True, **a)


C, Cm1, Cp1 = V("C", 0), V("C", -1), V("C", 1)
K, Km1, Kp1 = V("K", 0), V("K", -1), V("K", 1)
lam, lamp1 = V("lambda__H", 0), V("lambda__H", 1)
r, rp1 = V("r", 0), V("r", 1)
beta = sp.Symbol("beta", real=True, positive=True)
delta = sp.Symbol("delta", real=True, positive=True)


def test_step_forward_simultaneous():
    # C_t -> C_tp1 while C_tp1 -> C_tp2 must not collide
    e = C + Cp1
    stepped = step_equation_forward(e)
    assert stepped == Cp1 + V("C", 2)


def test_step_backward():
    assert step_equation_backward(C + Kp1) == Cm1 + K


def test_steps_fix_ss_and_parameters():
    Css = C.to_ss()
    e = Css + beta * C
    assert step_equation_forward(e) == Css + beta * Cp1
    assert step_equation_backward(e) == Css + beta * Cm1


def test_step_non_sympy_passthrough():
    assert step_equation_forward(3.5) == 3.5


def test_eq_to_ss():
    e = C - beta * Cp1 * (1 + r)
    ss = eq_to_ss(e)
    Css, rss = C.to_ss(), r.to_ss()
    assert ss == Css - beta * Css * (1 + rss)


def test_diff_through_time_euler_equation():
    # Per-period Lagrangian of the standard RBC capital choice:
    #   L_t = log(C_t) - lam_t (C_t + K_t - r_t K_{t-1} - (1-delta) K_{t-1})
    # dL/dK at time 0 must give the Euler condition
    #   -lam_t + beta lam_{t+1} (r_{t+1} + 1 - delta)
    L = sp.log(C) - lam * (C + K - r * Km1 - (1 - delta) * Km1)
    foc = diff_through_time(L, K, beta)
    expected = -lam + beta * lamp1 * (rp1 + 1 - delta)
    assert sp.simplify(foc - expected) == 0


def test_diff_through_time_control_only_current():
    # consumption appears only at time t: a single ordinary derivative
    L = sp.log(C) - lam * C
    foc = diff_through_time(L, C, beta)
    assert sp.simplify(foc - (1 / C - lam)) == 0


def test_diff_through_time_absent_symbol_is_zero():
    L = sp.log(C)
    assert diff_through_time(L, K, beta) == 0


def test_diff_through_time_two_period_lag():
    # x_{t-2} in the objective: two forward steps contribute beta^2
    x, xm2 = V("x", 0), V("x", -2)
    L = x + 0.5 * xm2**2
    foc = diff_through_time(L, x, beta)
    xp2_free = step_equation_forward(step_equation_forward(0.5 * xm2**2))
    assert sp.simplify(foc - (1 + beta**2 * x)) == 0
    assert xp2_free == 0.5 * x**2  # sanity on the helper itself


def test_diff_through_time_time_varying_discount():
    # discount itself carries a time index: products must step too
    b = V("b", 0)
    L = -lam * K + sp.log(Km1)
    foc = diff_through_time(L, K, b)
    expected = -lam + b * (1 / K)
    assert sp.simplify(foc - expected) == 0


def test_flatten_substitution_dict_chain():
    w_ss, r_ss, k_ss = V("w", "ss"), V("r", "ss"), V("k", "ss")
    sub = {w_ss: 2 * r_ss, r_ss: k_ss + 1}
    flat = flatten_substitution_dict(sub)
    assert flat[w_ss] == 2 * (k_ss + 1)
    assert flat[r_ss] == k_ss + 1


def test_flatten_substitution_dict_cycle_raises():
    a, b = sp.Symbol("a"), sp.Symbol("b")
    with pytest.raises(ValueError, match="[Cc]ycl"):
        flatten_substitution_dict({a: b + 1, b: a - 1})


def test_expand_subs_for_all_times():
    sub = {C: K**2}
    out = expand_subs_for_all_times(sub)
    assert out[Cp1] == Kp1**2
    assert out[Cm1] == Km1**2
    assert out[C.to_ss()] == K.to_ss() ** 2


def test_expand_subs_passthrough_plain_symbols():
    out = expand_subs_for_all_times({beta: 0.99})
    assert out == {beta: 0.99}


def test_substitute_all_equations_list_and_dict():
    eqs = [C - K, C + K]
    out = substitute_all_equations(eqs, {C: 2 * K})
    assert out == [K, 3 * K]
    d = substitute_all_equations({"a": C - K}, {C: 2 * K})
    assert d["a"] == K
