"""Variable timing classification unit tests (models/timing.py).

Reference role: gEconpy/model/timing.py (natural_sort_key:10,
classify_variables_by_timing:43, make_all_variable_time_combinations:96).
"""

import numpy as np

from geconpy_tpu.models.timing import (
    classify_variables_by_timing,
    make_all_variable_time_combinations,
    natural_sort_key,
    structural_incidence,
)
from geconpy_tpu.symbolic import TimeAwareSymbol


def V(name, t):
    return TimeAwareSymbol(name, t, real=True)


def test_natural_sort_key():
    names = ["x10", "x2", "x1", "y1", "X3"]
    assert sorted(names, key=natural_sort_key) == ["x1", "x2", "X3", "x10", "y1"]


def test_time_combinations_aligned():
    vs = [V("C", 0), V("K", 0)]
    lags, now, leads = make_all_variable_time_combinations(vs)
    assert [v.name for v in lags] == ["C_tm1", "K_tm1"]
    assert [v.name for v in now] == ["C_t", "K_t"]
    assert [v.name for v in leads] == ["C_tp1", "K_tp1"]


def test_structural_incidence():
    C, K, A = V("C", 0), V("K", 0), V("A", 0)
    eqs = [
        C - V("K", -1) ** 0.3,          # eq0: C now, K lag
        K - V("A", 1) * C,              # eq1: K now, A lead, C now
    ]
    inc = structural_incidence(eqs, [C, K, A])
    np.testing.assert_array_equal(inc["now"], [[True, False, False],
                                               [True, True, False]])
    np.testing.assert_array_equal(inc["lag"], [[False, True, False],
                                               [False, False, False]])
    np.testing.assert_array_equal(inc["lead"], [[False, False, False],
                                                [False, False, True]])


def test_unknown_symbols_ignored():
    C = V("C", 0)
    eqs = [C - V("Z", -1)]  # Z not in the variable list
    inc = structural_incidence(eqs, [C])
    assert inc["lag"].sum() == 0


def test_classification_partitions():
    C, K, E, L = V("C", 0), V("K", 0), V("E", 0), V("L", 0)
    eqs = [
        C - V("C", -1) - V("C", 1),   # C mixed
        K - V("K", -1),               # K predetermined
        E - V("E", 1),                # E forward
        L - C,                        # L static
    ]
    out = classify_variables_by_timing(eqs, [C, K, E, L])
    assert out["mixed"] == [C]
    assert out["predetermined"] == [K]
    assert out["forward"] == [E]
    assert out["static"] == [L]
    # every variable appears exactly once
    total = sum(len(v) for v in out.values())
    assert total == 4
