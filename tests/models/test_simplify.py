"""Symbolic simplification unit tests (models/simplify.py).

Reference role: gEconpy/model/simplification.py (simplify_tryreduce:38,
simplify_constants:117).
"""

import pytest
import sympy as sp

from geconpy_tpu.models.simplify import simplify_constants, simplify_tryreduce
from geconpy_tpu.symbolic import TimeAwareSymbol


def V(name, t=0):
    return TimeAwareSymbol(name, t, real=True)


C, K, U, P, B = V("C"), V("K"), V("U"), V("P"), V("B")
beta = sp.Symbol("beta", real=True)


def test_tryreduce_removes_self_contained_variable():
    # U appears only in its own defining (Bellman) equation
    eqs = [
        U - sp.log(C) - beta * V("U", 1),
        C - V("K", -1) ** sp.Rational(1, 3),
        K - C,
    ]
    new_eqs, new_vars, eliminated = simplify_tryreduce([U], eqs, [U, C, K])
    assert eliminated == [U]
    assert set(new_vars) == {C, K}
    assert len(new_eqs) == 2
    assert all(not eq.has(U) and not eq.has(V("U", 1)) for eq in new_eqs)


def test_tryreduce_keeps_variable_used_elsewhere():
    # U appears in two equations -> not removable
    eqs = [
        U - sp.log(C),
        C - U,
    ]
    new_eqs, new_vars, eliminated = simplify_tryreduce([U], eqs, [U, C])
    assert eliminated == []
    assert new_eqs == eqs


def test_tryreduce_only_marked_variables():
    eqs = [
        U - sp.log(C),  # U self-contained but NOT marked
        C - K,
        K - C * 2,
    ]
    new_eqs, new_vars, eliminated = simplify_tryreduce([], eqs, [U, C, K])
    assert eliminated == []


def test_tryreduce_not_square_warns_and_noops():
    eqs = [U - sp.log(C)]
    with pytest.warns(UserWarning, match="not square"):
        new_eqs, new_vars, eliminated = simplify_tryreduce([U], eqs, [U, C])
    assert new_eqs == eqs and eliminated == []


def test_constants_folds_pinned_variable():
    # P[] = 1 everywhere; B[] = 0
    eqs = [
        P - 1,
        B,
        C - P * V("K", -1) + B,
        K - C,
    ]
    new_eqs, new_vars, eliminated = simplify_constants(eqs, [P, B, C, K])
    assert set(eliminated) == {P, B}
    assert set(new_vars) == {C, K}
    assert len(new_eqs) == 2
    # substitution applied at every time index
    assert all(not eq.has(P) and not eq.has(V("P", -1)) for eq in new_eqs)
    target = C - V("K", -1)
    assert any(sp.simplify(eq - target) == 0 for eq in new_eqs)


def test_constants_no_candidates_noop():
    eqs = [C - sp.log(K), K - C]
    new_eqs, new_vars, eliminated = simplify_constants(eqs, [C, K])
    assert new_eqs == eqs and eliminated == []
