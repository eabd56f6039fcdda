"""Steady-state and solution validation helpers.

Role parity with ``gEconpy/model/statistics/validation.py`` (check_steady_state
at :188): evaluate the full steady-state residual vector for a candidate
steady state and report the offending equations when it fails.  Pure host-side
convenience — the device path validates via success flags and residual norms
(see ``models/steady_state.py``).
"""

from __future__ import annotations

import logging

import numpy as np

_log = logging.getLogger(__name__)

__all__ = ["evaluate_steady_state_residuals", "check_steady_state"]

_FLOAT_ZERO = 1e-8


def evaluate_steady_state_residuals(model, steady_state, **parameter_updates
                                    ) -> np.ndarray:
    """Residuals of every model equation (plus calibrating equations) at a
    candidate steady state.

    ``steady_state`` is a mapping from steady-state symbols (or their string
    names, e.g. ``"C_ss"``) to values — typically a
    :class:`~geconpy_tpu.symbolic.containers.SteadyStateResults`.
    """
    mf = model.functions

    def lookup(sym):
        if sym in steady_state:
            return float(steady_state[sym])
        return float(steady_state[str(sym)])

    theta = model.default_theta(**parameter_updates)
    theta_full = np.asarray(mf.f_params(theta))
    if mf.calibrated_params:
        calib = np.asarray([lookup(p) for p in mf.calibrated_params])
        theta_full = np.concatenate([theta_full, calib])
    x_ss = np.asarray([lookup(v.to_ss()) for v in mf.variables])
    resid = np.asarray(mf.f_ss_resid(x_ss, theta_full))
    if mf.calibrated_params:
        resid = np.concatenate(
            [resid, np.asarray(mf.f_calib_resid(x_ss, theta_full))])
    return resid


def check_steady_state(model, steady_state=None,
                       steady_state_kwargs: dict | None = None,
                       tol: float | None = None,
                       **parameter_updates) -> bool:
    """Verify a steady state satisfies every model equation.

    Solves the steady state first when ``steady_state`` is not given.  On
    failure, logs each equation whose residual exceeds ``tol`` together with
    the residual value (reference behavior:
    ``gEconpy/model/statistics/validation.py:188``).  Returns ``True`` when
    all residuals are within tolerance.
    """
    if steady_state is None:
        steady_state = model.steady_state(
            verbose=False, **(steady_state_kwargs or {}), **parameter_updates)

    resid = evaluate_steady_state_residuals(model, steady_state,
                                            **parameter_updates)
    if tol is None:
        # dtype-aware: 1e-8 in float64, ~1e-4 when the backend solved in
        # float32 (TPU default) — see ops/tolerances.py
        from ..ops.tolerances import success_tol

        tol = success_tol(resid.dtype, _FLOAT_ZERO)
    bad = np.abs(resid) > tol
    if not bad.any():
        _log.info("Steady state successfully found! (max |resid| %.3e)",
                  float(np.max(np.abs(resid))) if resid.size else 0.0)
        return True

    _log.warning("Steady state NOT successful. Equations with non-zero "
                 "residuals:")
    prim = model.primitives
    equations = list(prim.equations) + [
        prim.calib_dict[p] for p in model.functions.calibrated_params]
    for i in np.flatnonzero(bad):
        eq = equations[i] if i < len(equations) else f"calibrating eq {i}"
        _log.warning("  %s", eq)
        _log.warning("  residual: %0.6g", float(resid[i]))
    return False
