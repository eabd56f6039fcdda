"""Load real Dynare ``*_results.mat`` outputs for external parity tests.

The ``.mat`` fixtures under ``fixtures/dynare_outputs/`` are genuine Dynare
runs — third-party oracle DATA vendored from the upstream gEconpy test
resources (jessegrabowski/gEconpy, ``tests/_resources/dynare_outputs/``) so
the parity suite is self-contained; the loader below is our own
implementation of MATLAB struct-array unpacking (role parity with the
reference recipe at ``tests/_resources/load_dynare.py:32-62``).

Dynare bookkeeping:
- ``M_.endo_names``     — variables in declaration order
- ``M_.state_var``      — 1-based indices (declaration order) of state vars
- ``oo_.dr.order_var``  — 1-based declaration-order index for each row of the
  decision rule (DR order: static, predetermined, mixed, forward)
- ``oo_.dr.ghx``        — dy_t/ds_{t-1}, rows in DR order, columns = states in
  DR order
- ``oo_.dr.ghu``        — dy_t/de_t, rows in DR order, columns = shocks
"""

from pathlib import Path

import numpy as np
import pandas as pd
import scipy.io as sio

DYNARE_DIR = Path(__file__).parent / "fixtures" / "dynare_outputs"


def _struct_to_dict(rec) -> dict:
    """1x1 MATLAB struct array -> {field: squeezed value}."""
    rec = np.squeeze(np.asarray(rec))  # () -shaped structured scalar
    return {name: np.squeeze(rec[name][()]) for name in rec.dtype.names}


def _names_column(cell) -> list[str]:
    """MATLAB cellstr column -> list of python strings."""
    flat = np.atleast_1d(np.squeeze(np.asarray(cell, dtype=object)))
    return [str(np.atleast_1d(np.squeeze(item))[0]) for item in flat]


def available_dynare_models() -> dict[str, Path]:
    return {
        p.name.replace("_results.mat", ""): p
        for p in sorted(DYNARE_DIR.glob("*_results.mat"))
    }


def load_dynare_policy(model_name: str) -> dict[str, pd.DataFrame]:
    """Return labeled Dynare policy matrices {"T": ghx, "R": ghu}.

    Rows are variable names (DR order); T's columns are the state-variable
    names (DR order), R's columns are shock names.
    """
    path = available_dynare_models()[model_name]
    raw = sio.loadmat(str(path))
    M = _struct_to_dict(raw["M_"])
    oo = _struct_to_dict(raw["oo_"])
    dr = _struct_to_dict(oo["dr"])

    endo = _names_column(M["endo_names"])
    exo = _names_column(M["exo_names"])
    state_idx = np.ravel(np.asarray(M["state_var"], dtype=int)) - 1
    order_var = np.ravel(np.asarray(dr["order_var"], dtype=int)) - 1

    row_names = [endo[i] for i in order_var]
    state_names = [endo[i] for i in order_var if i in set(state_idx)]

    ghx = np.asarray(dr["ghx"], dtype=float)
    ghu = np.asarray(dr["ghu"], dtype=float)
    T = pd.DataFrame(ghx, index=row_names, columns=state_names)
    R = pd.DataFrame(ghu, index=row_names, columns=exo)
    return {"T": T, "R": R}
