"""Builds the packed JAX functions for one model.

This is the single seam between the symbolic world (sympy primitives) and the
numeric world (jitted JAX).  Everything downstream — steady state,
linearization, policy solves, Kalman likelihood — consumes only these
functions and static index metadata, so shapes are fixed per model and every
function is jit/vmap-safe.

Role parity with ``gEconpy/model/compile.py`` (sympy_to_pytensor:104,
compile_param_dict_func via model/parameters.py:11, pack_and_compile:402) and
``gEconpy/model/steady_state.py`` (_ss_residual_to_pytensor:74,
_substitute_and_filter:142, compile_known_ss:315).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import sympy as sp

from ..models.primitives import ModelPrimitives
from ..models.timing import natural_sort_key
from ..ops.bijectors import VectorBijector, make_bijector
from ..symbolic import TimeAwareSymbol
from .lower import CompiledFunction, lower_to_jax

__all__ = ["ModelFunctions", "build_model_functions"]


@dataclass
class ModelFunctions:
    """Packed JAX functions + static metadata for one model."""

    # orderings (host-side, fixed at build)
    variables: list[TimeAwareSymbol]          # time t, canonical order
    shocks: list[TimeAwareSymbol]
    free_params: list[sp.Symbol]
    deterministic_params: list[sp.Symbol]
    calibrated_params: list[sp.Symbol]

    # f_params: free (p,) -> full theta (P,) excluding calibrated
    f_params: CompiledFunction
    # f_resid(y_m1, y, y_p1, eps, x_ss, theta_full) -> (n,)
    f_resid: CompiledFunction
    # f_ss_resid(x_ss, theta_full) -> (n,) — model equations at the steady state
    f_ss_resid: CompiledFunction
    # f_calib_resid(x_ss, theta_full) -> (n_calib,)
    f_calib_resid: CompiledFunction | None

    # analytic steady state
    known_idx: np.ndarray                     # variable indices with analytic SS
    unknown_idx: np.ndarray
    f_ss_known: CompiledFunction | None       # theta_full -> values at known_idx
    eq_unknown_idx: np.ndarray                # equations containing >=1 unknown

    # unconstrained reparameterization for [unknown ss vars ++ calibrated params]
    bijector: VectorBijector

    # symbolic linearization: nonzero entries of the stacked [A|B|C|D]
    # Jacobian (same signature as f_resid) + their static scatter indices;
    # None falls back to runtime jacfwd (see models/perturbation.py)
    f_lin_nz: CompiledFunction | None = None
    lin_rows: np.ndarray | None = None
    lin_cols: np.ndarray | None = None

    @property
    def n_variables(self) -> int:
        """Number of model variables."""
        return len(self.variables)

    @property
    def n_shocks(self) -> int:
        """Number of exogenous shocks."""
        return len(self.shocks)

    @property
    def n_params(self) -> int:
        """Length of theta_full = free + deterministic + calibrated."""
        return (len(self.free_params) + len(self.deterministic_params)
                + len(self.calibrated_params))

    @property
    def param_symbols(self) -> list[sp.Symbol]:
        """theta_full symbol order: free, deterministic, calibrated."""
        return list(self.free_params) + list(self.deterministic_params) \
            + list(self.calibrated_params)

    @property
    def param_names(self) -> list[str]:
        """Names matching :attr:`param_symbols`."""
        return [p.name for p in self.param_symbols]

    @property
    def variable_names(self) -> list[str]:
        """Base variable names in system order."""
        return [v.base_name for v in self.variables]

    @property
    def shock_names(self) -> list[str]:
        """Base shock names in system order."""
        return [s.base_name for s in self.shocks]

    @property
    def has_full_analytic_ss(self) -> bool:
        """True when the GCN steady-state block pins every variable (no Newton)."""
        return len(self.unknown_idx) == 0

    @property
    def n_unknowns(self) -> int:
        """Numeric steady-state unknowns (variables + calibrated params)."""
        return len(self.unknown_idx) + len(self.calibrated_params)


def build_model_functions(primitives: ModelPrimitives) -> ModelFunctions:
    """Lower ModelPrimitives to the jittable per-model function bundle (params, steady state, residuals, jacobians, bijector)."""
    variables = list(primitives.variables)
    shocks = list(primitives.shocks)
    n = len(variables)

    free_params = sorted(primitives.param_dict.keys(), key=lambda s: natural_sort_key(s.name))
    det_params = sorted(primitives.deterministic_dict.keys(), key=lambda s: natural_sort_key(s.name))
    calib_params = sorted(primitives.calib_dict.keys(), key=lambda s: natural_sort_key(s.name))

    theta_symbols = free_params + det_params + calib_params

    # ---- f_params: free -> (free ++ deterministic ++ calibrated placeholder)
    # Calibrated params are appended by the steady-state solver; f_params only
    # computes free+deterministic.  Deterministic relations are already
    # flattened, so each is an expression in free params only.
    det_exprs = [primitives.deterministic_dict[p] for p in det_params]
    f_params = lower_to_jax(
        [sp.sympify(p) for p in free_params] + [sp.sympify(e) for e in det_exprs],
        [("free", free_params)],
        name="f_params",
        docstring="free parameters -> (free ++ deterministic) parameter vector",
    )

    # ---- dynamic residual.  Equations may reference steady-state symbols
    # (e.g. Taylor rules written around R[ss]); those enter as an extra
    # packed input evaluated once per draw.
    lags = [v.set_t(-1) for v in variables]
    now = [v.set_t(0) for v in variables]
    leads = [v.set_t(1) for v in variables]
    ss_syms_dyn = [v.to_ss() for v in variables]
    f_resid = lower_to_jax(
        primitives.equations,
        [("y_m1", lags), ("y", now), ("y_p1", leads), ("eps", shocks),
         ("x_ss", ss_syms_dyn), ("theta", theta_symbols)],
        name="f_resid",
        docstring="dynamic residuals F(y_{t-1}, y_t, y_{t+1}, eps_t; x_ss, theta)",
    )

    # ---- steady-state residual over all model equations
    ss_syms = [v.to_ss() for v in variables]
    ss_equations = primitives.steady_state_system
    f_ss_resid = lower_to_jax(
        ss_equations,
        [("x_ss", ss_syms), ("theta", theta_symbols)],
        name="f_ss_resid",
        docstring="steady-state residuals F(x_ss; theta)",
    )

    # ---- calibrating equations
    f_calib_resid = None
    if calib_params:
        calib_exprs = [primitives.calib_dict[p] for p in calib_params]
        f_calib_resid = lower_to_jax(
            calib_exprs,
            [("x_ss", ss_syms), ("theta", theta_symbols)],
            name="f_calib_resid",
            docstring="calibrating-equation residuals at the steady state",
        )

    # ---- symbolic linearization Jacobians (reference:
    # build_symbolic_jacobians, gEconpy/model/compile.py:163).  Only the
    # NONZERO entries of [A | B | C | D] are differentiated, CSE'd in one
    # shared pass, and lowered; the linearizer scatters them into the dense
    # blocks with static indices.  Evaluating a few hundred sparse entries
    # per draw is ~5x cheaper than runtime jacfwd over every input
    # dimension (measured ~8 us/draw of the SW-2007 batched hot path), and
    # it shrinks both the forward sweep and the NUTS value+grad.
    col_syms = list(lags) + list(now) + list(leads) + list(shocks)
    lin_rows: list[int] = []
    lin_cols: list[int] = []
    lin_exprs: list[sp.Expr] = []
    for i, eq in enumerate(primitives.equations):
        eq = sp.sympify(eq)
        free_syms = eq.free_symbols
        for j, s in enumerate(col_syms):
            if s not in free_syms:
                continue
            d = sp.diff(eq, s)
            if d == 0:
                continue
            lin_rows.append(i)
            lin_cols.append(j)
            lin_exprs.append(d)
    f_lin_nz = lower_to_jax(
        lin_exprs,
        [("y_m1", lags), ("y", now), ("y_p1", leads), ("eps", shocks),
         ("x_ss", ss_syms_dyn), ("theta", theta_symbols)],
        name="f_lin_nz",
        docstring="nonzero entries of the stacked [A|B|C|D] Jacobian",
    )

    # ---- analytic steady state: which variables are known?
    ss_dict = primitives.ss_solution_dict
    known_mask = np.zeros(n, dtype=bool)
    known_exprs: list[sp.Expr] = []
    for i, v in enumerate(variables):
        key = v.to_ss()
        if key in ss_dict:
            known_mask[i] = True
            known_exprs.append(ss_dict[key])
    known_idx = np.flatnonzero(known_mask)
    unknown_idx = np.flatnonzero(~known_mask)

    f_ss_known = None
    if len(known_idx):
        f_ss_known = lower_to_jax(
            known_exprs,
            [("theta", theta_symbols)],
            name="f_ss_known",
            docstring="analytic steady-state values (known subset) from parameters",
        )

    # ---- equations that still contain an unknown after substituting knowns.
    # Unknowns are the un-solved steady-state variables and (when present)
    # calibrated parameters, which are solved jointly with the steady state.
    unknown_names = {variables[i].base_name for i in unknown_idx}
    calib_set = set(calib_params)
    eq_has_unknown = np.zeros(len(ss_equations), dtype=bool)
    for j, eq in enumerate(ss_equations):
        if eq.free_symbols & calib_set:
            eq_has_unknown[j] = True
            continue
        for atom in eq.atoms(TimeAwareSymbol):
            if atom.base_name in unknown_names:
                eq_has_unknown[j] = True
                break
    eq_unknown_idx = np.flatnonzero(eq_has_unknown)

    # ---- bijector over [unknown ss vars ++ calibrated params]
    assumption_dicts = [dict(variables[i].assumptions0) for i in unknown_idx]
    assumption_dicts += [dict(p.assumptions0) for p in calib_params]
    bijector = make_bijector(assumption_dicts)

    return ModelFunctions(
        variables=variables,
        shocks=shocks,
        free_params=free_params,
        deterministic_params=det_params,
        calibrated_params=calib_params,
        f_params=f_params,
        f_resid=f_resid,
        f_ss_resid=f_ss_resid,
        f_calib_resid=f_calib_resid,
        known_idx=known_idx,
        unknown_idx=unknown_idx,
        f_ss_known=f_ss_known,
        eq_unknown_idx=eq_unknown_idx,
        bijector=bijector,
        f_lin_nz=f_lin_nz,
        lin_rows=np.asarray(lin_rows, dtype=np.int32),
        lin_cols=np.asarray(lin_cols, dtype=np.int32),
    )
