"""Deep lag/lead expansion unit tests.

Covers geconpy_tpu/lang/expand_time.py — role parity with the reference's
gEconpy/parser/transform/expand_time_indices.py (DeepTimeIndexCollector:28,
DeepTimeIndexReplacer:46).
"""

import sympy as sp

from geconpy_tpu.lang.expand_time import expand_deep_time_indices
from geconpy_tpu.symbolic import TimeAwareSymbol


def V(name, t, **a):
    return TimeAwareSymbol(name, t, real=True, **a)


def test_noop_for_first_order_system():
    eqs = [V("x", 0) - 0.9 * V("x", -1), V("y", 0) - V("y", 1)]
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices(eqs)
    assert rewritten == eqs
    assert aux_eqs == [] and aux_vars == []


def test_single_deep_lag():
    x, xm1 = V("x", 0), V("x", -1)
    eqs = [x - 0.5 * V("x", -2)]
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices(eqs)
    lag1_now, lag1_m1 = V("x__lag1", 0), V("x__lag1", -1)
    assert rewritten == [x - 0.5 * lag1_m1]
    assert aux_eqs == [lag1_now - xm1]
    assert aux_vars == [lag1_now]


def test_lag_chain_depth_three():
    x = V("x", 0)
    eqs = [x - V("x", -3)]
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices(eqs)
    assert [v.name for v in aux_vars] == ["x__lag1_t", "x__lag2_t"]
    # chain identities: lag1_t = x_{t-1}, lag2_t = lag1_{t-1}
    assert aux_eqs[0] == V("x__lag1", 0) - V("x", -1)
    assert aux_eqs[1] == V("x__lag2", 0) - V("x__lag1", -1)
    # x[-3] -> x__lag2[-1]
    assert rewritten == [x - V("x__lag2", -1)]
    # the rewritten system only involves t-1..t+1
    all_times = {
        a.time_index
        for eq in rewritten + aux_eqs
        for a in eq.atoms(TimeAwareSymbol)
    }
    assert all_times <= {-1, 0, 1}


def test_deep_lead():
    y = V("y", 0)
    eqs = [y - V("y", 2)]
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices(eqs)
    assert aux_vars == [V("y__lead1", 0)]
    assert aux_eqs == [V("y__lead1", 0) - V("y", 1)]
    assert rewritten == [y - V("y__lead1", 1)]


def test_mixed_lags_and_leads_multiple_vars():
    x, y = V("x", 0), V("y", 0)
    eqs = [x - V("x", -2) + V("y", 3), y - V("x", -4)]
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices(eqs)
    names = {v.name for v in aux_vars}
    assert names == {"x__lag1_t", "x__lag2_t", "x__lag3_t",
                     "y__lead1_t", "y__lead2_t"}
    all_times = {
        a.time_index
        for eq in rewritten + aux_eqs
        for a in eq.atoms(TimeAwareSymbol)
    }
    assert all_times <= {-1, 0, 1}
    # x[-2] shares the chain with x[-4]
    assert rewritten[0].has(V("x__lag1", -1))
    assert rewritten[1].has(V("x__lag3", -1))


def test_assumptions_propagate_to_auxiliaries():
    k = TimeAwareSymbol("k", 0, real=True, positive=True)
    km2 = TimeAwareSymbol("k", -2, real=True, positive=True)
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices([k - km2])
    assert aux_vars[0].assumptions0.get("positive") is True


def test_ss_symbols_ignored():
    x = V("x", 0)
    eqs = [x - V("x", "ss") * V("x", -2)]
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices(eqs)
    assert len(aux_vars) == 1
    assert rewritten[0].has(V("x", "ss"))


def test_solution_sanity_ar2_dynamics():
    """An AR(2) written with a deep lag must produce identical dynamics after
    expansion: substitute the chain identities and recover the original."""
    x = V("x", 0)
    orig = x - 0.5 * V("x", -1) - 0.25 * V("x", -2)
    rewritten, aux_eqs, aux_vars = expand_deep_time_indices([orig])
    # substitute x__lag1[-1] using the (back-shifted) identity x__lag1[] = x[-1]
    ident = aux_eqs[0]  # x__lag1_t - x_tm1
    sub = {V("x__lag1", -1): V("x", -2)}
    assert sp.simplify(rewritten[0].xreplace(sub) - orig) == 0
