"""SymbolDictionary / SteadyStateResults unit tests.

Mirrors the reference's container coverage (gEconpy/classes/containers.py:109,362
tested in tests/classes/) for the fresh implementation in
geconpy_tpu/symbolic/containers.py.
"""

import pickle

import pytest
import sympy as sp

from geconpy_tpu.symbolic import SteadyStateResults, SymbolDictionary, TimeAwareSymbol


C = TimeAwareSymbol("C", 0, real=True, positive=True)
K = TimeAwareSymbol("K", -1, real=True)
alpha = sp.Symbol("alpha", real=True, positive=True)


def test_mixed_representation_lookup():
    d = SymbolDictionary({C: 1.0, alpha: 0.35})
    assert d["C_t"] == 1.0
    assert d["alpha"] == 0.35
    assert "C_t" in d and C in d
    assert "alpha" in d and alpha in d
    assert "missing" not in d


def test_string_key_looks_up_symbol_entry_and_back():
    d = SymbolDictionary({"alpha": 0.35})
    assert d[sp.Symbol("alpha")] == 0.35
    assert d.get("beta") is None
    assert d.get("beta", 7) == 7


def test_getitem_raises_for_truly_missing():
    d = SymbolDictionary({C: 1.0})
    with pytest.raises(KeyError):
        d["Z_t_oops"]


def test_to_string_and_back_preserves_assumptions():
    d = SymbolDictionary({C: 2.0, alpha: 0.3})
    s = d.to_string()
    assert set(s) == {"C_t", "alpha"}
    back = s.to_sympy()
    keys = {k.name: k for k in back}
    assert keys["C_t"].assumptions0.get("positive") is True
    assert keys["alpha"].assumptions0.get("positive") is True
    # time-aware key is reconstructed as a TimeAwareSymbol, not a plain Symbol
    assert isinstance(keys["C_t"], TimeAwareSymbol)
    assert keys["C_t"].base_name == "C"
    assert keys["C_t"].time_index == 0


def test_is_sympy():
    assert SymbolDictionary({C: 1.0}).is_sympy()
    assert not SymbolDictionary({"C_t": 1.0}).is_sympy()


def test_time_algebra_bulk_ops():
    d = SymbolDictionary({C: 1.0, K: 2.0, alpha: 0.3})
    ss = d.to_ss()
    names = {k.name for k in ss}
    assert names == {"C_ss", "K_ss", "alpha"}

    fwd = d.step_forward()
    assert {k.name for k in fwd} == {"C_tp1", "K_t", "alpha"}

    back = d.step_backward()
    assert {k.name for k in back} == {"C_tm1", "K_tm2", "alpha"}


def test_sort_keys_natural_order():
    k2 = sp.Symbol("x2")
    k10 = sp.Symbol("x10")
    k1 = sp.Symbol("x1")
    d = SymbolDictionary({k10: 1, k1: 2, k2: 3})
    assert [k.name for k in d.sort_keys()] == ["x1", "x2", "x10"]


def test_values_to_float():
    d = SymbolDictionary({C: sp.Rational(1, 4), alpha: sp.Float(0.3)})
    f = d.values_to_float()
    assert f[C] == 0.25
    assert isinstance(f[C], float)


def test_union_merges_assumptions():
    d1 = SymbolDictionary({C: 1.0})
    d2 = SymbolDictionary({alpha: 0.3})
    merged = d1 | d2
    assert isinstance(merged, SymbolDictionary)
    assert set(merged) == {C, alpha}
    rt = merged.to_string().to_sympy()
    assert {k.name: k for k in rt}["alpha"].assumptions0.get("positive") is True


def test_copy_is_independent():
    d = SymbolDictionary({C: 1.0})
    c = d.copy()
    c[alpha] = 0.3
    assert alpha not in d


def test_pickle_roundtrip():
    d = SymbolDictionary({C: 1.0, alpha: 0.3})
    rt = pickle.loads(pickle.dumps(d))
    assert isinstance(rt, SymbolDictionary)
    assert rt["C_t"] == 1.0
    # assumptions survive the round trip
    back = rt.to_string().to_sympy()
    assert {k.name: k for k in back}["C_t"].assumptions0.get("positive") is True


def test_steady_state_results_flags_and_pickle():
    r = SteadyStateResults({C.to_ss(): 1.5}, success=False, resid_norm=1e-3)
    assert not r.success
    assert r.resid_norm == pytest.approx(1e-3)
    assert "FAILED" in repr(r)
    rt = pickle.loads(pickle.dumps(r))
    assert isinstance(rt, SteadyStateResults)
    assert not rt.success
    assert rt.resid_norm == pytest.approx(1e-3)
    assert rt["C_ss"] == 1.5


def test_steady_state_results_default_success_repr():
    r = SteadyStateResults({C.to_ss(): 1.5})
    assert r.success
    assert "converged" in repr(r)
