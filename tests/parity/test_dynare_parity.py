"""External accuracy anchors: policy matrices vs real Dynare output.

The reference validates its solvers against genuine Dynare runs at
atol=rtol=1e-5 (``/root/reference/tests/model/test_model.py:543,561-562``).
We do the same, for BOTH policy solvers (device cycle reduction and the
disk-split gensys) plus the host scipy-ordqz oracle — converting
"agrees with our own oracle" into "agrees with the field".

Dynare conventions: ghx rows are variables in DR order, columns are the
state variables; entries are d y_t / d s_{t-1}.  Our full T (n x n) restricted
to state columns must match.
"""

from pathlib import Path

import numpy as np
import pytest
from numpy.testing import assert_allclose

import geconpy_tpu

from .load_dynare import load_dynare_policy

GCN_DIR = Path(__file__).parent / "gcn"

# (dynare fixture name, gcn path, loglin)
CASES = [
    ("one_block_1_ss", GCN_DIR / "one_block_1_ss.gcn", False),
    ("rbc_2_block_ss", GCN_DIR / "rbc_2_block_ss.gcn", False),
    ("basic_rbc", geconpy_tpu.get_example_gcn("rbc"), False),
    ("basic_rbc_loglinear", geconpy_tpu.get_example_gcn("rbc"), True),
    ("full_nk", GCN_DIR / "full_nk_calvo.gcn", False),
]

_MODEL_CACHE: dict = {}


def _solve(gcn_path, loglin, solver):
    key = str(gcn_path)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = geconpy_tpu.model_from_gcn(gcn_path, verbose=False)
    model = _MODEL_CACHE[key]
    return model.solve_model(
        solver=solver, loglin_variables=True if loglin else False, verbose=False)


@pytest.mark.parametrize("solver", ["cycle_reduction", "gensys", "gensys_host"])
@pytest.mark.parametrize(
    "dynare_name,gcn_path,loglin", CASES, ids=[c[0] for c in CASES])
def test_policy_matches_dynare(dynare_name, gcn_path, loglin, solver):
    dyn = load_dynare_policy(dynare_name)
    dynare_T, dynare_R = dyn["T"], dyn["R"]

    sol = _solve(gcn_path, loglin, solver)
    assert sol.success

    missing = set(dynare_T.index) - set(sol.T.index)
    assert not missing, f"model lacks Dynare variables: {sorted(missing)}"

    T = sol.T.reindex(index=dynare_T.index, columns=dynare_T.columns)
    R = sol.R.reindex(index=dynare_R.index, columns=dynare_R.columns)

    assert_allclose(T.to_numpy(), dynare_T.to_numpy(), atol=1e-5, rtol=1e-5,
                    err_msg=f"{dynare_name} T vs Dynare ({solver})")
    assert_allclose(R.to_numpy(), dynare_R.to_numpy(), atol=1e-5, rtol=1e-5,
                    err_msg=f"{dynare_name} R vs Dynare ({solver})")


def test_non_state_columns_are_zero():
    """Columns of T outside the Dynare state set must be (numerically) zero —
    a structural check that the two state concepts agree."""
    dyn = load_dynare_policy("rbc_2_block_ss")
    sol = _solve(GCN_DIR / "rbc_2_block_ss.gcn", False, "cycle_reduction")
    non_state = [c for c in sol.T.columns if c not in set(dyn["T"].columns)]
    block = sol.T.reindex(index=dyn["T"].index)[non_state].to_numpy()
    assert np.max(np.abs(block)) < 1e-8
