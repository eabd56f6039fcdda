"""Labeling helpers for model matrices.

Role parity with ``gEconpy/model/statistics/formatting.py`` (matrix_to_dataframe
at :4): attach variable / shock / equation names to raw arrays so solver
outputs can be compared and displayed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["matrix_to_dataframe"]


def matrix_to_dataframe(matrix, model, dim1: str | None = None,
                        dim2: str | None = None,
                        round: int | None = None) -> pd.DataFrame:
    """Label a 2-D model matrix with variable / shock / equation names.

    Dimension names are one of ``'variable'``, ``'shock'``, ``'equation'``;
    when omitted they are inferred from the matrix shape (``variable`` wins
    over ``equation`` on ties, matching the reference).
    """
    matrix = np.asarray(matrix)
    if matrix.ndim != 2:
        raise ValueError("matrix must be 2-dimensional")

    coords = {
        "variable": list(model.variables),
        "shock": list(model.shocks),
        "equation": [f"Equation {i}"
                     for i in range(len(model.primitives.equations))],
    }
    n_variables = len(coords["variable"])
    n_shocks = len(coords["shock"])

    def infer(size: int, which: str) -> str:
        if size == n_variables:
            return "variable"
        if size == n_shocks:
            return "shock"
        raise ValueError(
            f"{which} dimension ({size}) matches neither the number of "
            f"variables ({n_variables}) nor shocks ({n_shocks})")

    dim1 = dim1 or infer(matrix.shape[0], "first")
    dim2 = dim2 or infer(matrix.shape[1], "second")
    for d, size in ((dim1, matrix.shape[0]), (dim2, matrix.shape[1])):
        if d not in coords:
            raise ValueError(f"unknown dimension name {d!r}")
        if len(coords[d]) != size:
            raise ValueError(f"dimension {d!r} has {len(coords[d])} labels "
                             f"but the matrix axis has {size}")

    df = pd.DataFrame(matrix, index=coords[dim1], columns=coords[dim2])
    return df.round(round) if round is not None else df
