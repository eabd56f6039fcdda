"""Occasionally-binding constraints: piecewise-linear (OccBin) solutions.

Guerrieri & Iacoviello (2015, JME) "OccBin: A toolkit for solving dynamic
models with occasionally binding constraints easily" — no counterpart in
the reference gEconpy (beyond-parity capability, the standard tool for
zero-lower-bound and collateral-constraint analysis).

Setup: TWO GCN models over the same variables and shocks —

- the *reference* regime (constraint slack), which must satisfy
  Blanchard-Kahn and is linearized at its own steady state;
- the *alternative* regime (constraint binding), identical except for the
  equation(s) the constraint replaces (e.g. ``i[] = i_lb;`` instead of the
  Taylor rule), linearized at the SAME reference steady state (its
  residual there is the regime's constant term).

Regime switching is governed by two inequality strings in GCN expression
syntax evaluated on the simulated path (e.g. ``bind="inot[] < i_lb"``,
``relax="inot[] > i_lb"``; write the *notional* variable into both models
so the conditions are well-defined in either regime).

Algorithm (piecewise linear, fully on-device): guess the regime sequence
over the horizon; one backward ``lax.scan`` builds the time-varying policy
``y_t = P_t y_{t-1} + k_t + R_t eps_t`` (terminal condition: the reference
regime's constant policy T0 from cycle reduction); one forward scan
simulates; the conditions re-classify every period; ``lax.while_loop``
iterates to a fixed point of the regime sequence.  Static shapes
throughout — the guess-verify loop compiles once for a horizon.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..codegen.lower import lower_to_jax
from ..models.model import Model
from ..models.perturbation import make_linearizer
from ..ops.cycle_reduction import cycle_reduction
from ..ops.precision import highest_precision

__all__ = ["solve_occbin", "occbin_irf", "OccbinResult"]

_OPS = ["<=", ">=", "<", ">"]


class OccbinResult(NamedTuple):
    trajectory: pd.DataFrame   # (periods, n) levels, index = time 1..H
    regime: np.ndarray         # (periods,) 0 = reference, 1 = alternative
    success: bool
    n_iter: int


def _lower_condition(cond: str, mf):
    """``"lhs < rhs"`` -> jitted g(y_levels, x_ss, theta_full) with the
    convention g > 0 <=> condition true."""
    from ..lang.parser import parse_expression
    from ..lang.sympify import ast_to_sympy

    for op in _OPS:
        if op in cond:
            lhs_s, rhs_s = cond.split(op, 1)
            break
    else:
        raise ValueError(
            f"condition {cond!r} must contain one of {_OPS}")
    lhs = ast_to_sympy(parse_expression(lhs_s))
    rhs = ast_to_sympy(parse_expression(rhs_s))
    g = (rhs - lhs) if op in ("<", "<=") else (lhs - rhs)

    now = [v.set_t(0) for v in mf.variables]
    ss_syms = [v.to_ss() for v in mf.variables]
    theta_syms = (mf.free_params + mf.deterministic_params
                  + mf.calibrated_params)
    known = set().union(*[set(s.free_symbols) for s in (g,)])
    allowed = set(now) | set(ss_syms) | set(theta_syms)
    unknown = {s for s in known if s not in allowed}
    if unknown:
        raise ValueError(
            f"condition {cond!r} references unknown symbols "
            f"{sorted(str(s) for s in unknown)} (use current-period "
            f"variables v[], v[ss] references, and parameters)")
    return lower_to_jax([g], [("y", now), ("x_ss", ss_syms),
                              ("theta", theta_syms)],
                        name="occbin_condition")


def _permutation(names_from: list[str], names_to: list[str],
                 what: str) -> np.ndarray:
    if set(names_from) != set(names_to):
        only_a = sorted(set(names_from) - set(names_to))
        only_b = sorted(set(names_to) - set(names_from))
        raise ValueError(
            f"occbin regimes must share {what}; only in alternative: "
            f"{only_a}, only in reference: {only_b}")
    return np.asarray([names_from.index(n) for n in names_to])


@highest_precision
def _occbin_core(y0, eps_path, A, B, C, D, c, T0, x_ss, theta_r,
                 bind_fn, relax_fn, maxiter: int):
    """A/B/C: (2, n, n) stacked regime pencils (cols in reference order);
    D: (2, n, k); c: (2, n) regime constants.  Returns (ys, mask, n_iter,
    converged)."""
    H = eps_path.shape[0]
    n = T0.shape[0]
    dtype = T0.dtype

    def backward(mask):
        def bstep(carry, m_t):
            P_next, k_next = carry
            sel = m_t.astype(dtype)
            A_t = A[0] + sel * (A[1] - A[0])
            B_t = B[0] + sel * (B[1] - B[0])
            C_t = C[0] + sel * (C[1] - C[0])
            D_t = D[0] + sel * (D[1] - D[0])
            c_t = c[0] + sel * (c[1] - c[0])
            M = B_t + C_t @ P_next
            sol = jnp.linalg.solve(M, jnp.concatenate(
                [A_t, (C_t @ k_next + c_t)[:, None], D_t], axis=1))
            P_t = -sol[:, :n]
            k_t = -sol[:, n]
            R_t = -sol[:, n + 1:]
            return (P_t, k_t), (P_t, k_t, R_t)

        init = (T0, jnp.zeros((n,), dtype))
        _, seq = jax.lax.scan(bstep, init, mask, reverse=True)
        return seq

    def forward(seq):
        def fstep(y_prev, inp):
            P_t, k_t, R_t, eps_t = inp
            y_t = P_t @ y_prev + k_t + R_t @ eps_t
            return y_t, y_t

        _, ys = jax.lax.scan(fstep, y0, (*seq, eps_path))
        return ys

    def classify(mask, ys):
        levels = x_ss[None, :] + ys
        gb = jax.vmap(lambda y: bind_fn(y, x_ss, theta_r))(levels)[:, 0]
        gr = jax.vmap(lambda y: relax_fn(y, x_ss, theta_r))(levels)[:, 0]
        return jnp.where(mask, ~(gr > 0), gb > 0)

    def cond(state):
        _, _, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        mask, _, it, _ = state
        seq = backward(mask)
        ys = forward(seq)
        new_mask = classify(mask, ys)
        fixed = jnp.all(new_mask == mask)
        finite = jnp.all(jnp.isfinite(ys))
        return (new_mask, ys, it + 1, fixed | ~finite)

    mask0 = jnp.zeros((H,), bool)
    ys0 = forward(backward(mask0))
    state = (classify(mask0, ys0), ys0, jnp.asarray(1),
             jnp.asarray(False))
    # state mask is the NEXT guess; loop until it stops changing
    mask, ys, it, _ = jax.lax.while_loop(cond, body, state)
    seq = backward(mask)
    ys = forward(seq)
    settled = jnp.all(classify(mask, ys) == mask)
    finite = jnp.all(jnp.isfinite(ys))
    return ys, mask, it, settled & finite


def solve_occbin(
    model_ref: Model,
    model_alt: Model,
    bind: str,
    relax: str,
    periods: int = 100,
    shocks: dict[str, np.ndarray] | None = None,
    initial_state: dict[str, float] | None = None,
    maxiter: int = 100,
    **updates,
) -> OccbinResult:
    """Piecewise-linear path under an occasionally-binding constraint.

    ``shocks`` maps shock names to realized paths.  As in the OccBin
    toolkit, shocks are unanticipated (MIT) surprises — agents expect zero
    future shocks each period — while the *regime sequence* implied by the
    realized path is anticipated (perfect foresight over regimes enters
    the time-varying backward recursion).  ``initial_state`` sets period-0
    state deviations from the reference steady state.  ``updates`` override
    parameters by name in whichever regime model defines them.  Level
    (not log) linearization is used for both regimes so the switching
    conditions evaluate on level paths.

    ``success`` is False when the regime-sequence fixed point is not
    reached within ``maxiter`` guess-verify rounds (raise ``periods`` if
    the binding spell hits the horizon) or the path is non-finite.

    .. note:: if the binding regime pins a variable to a constant (e.g.
       ``i[] = i_lb;``), build the alternative model with
       ``model_from_gcn(..., simplify_constants_flag=False)`` so the
       variable is not eliminated by the constant-folding pass.
    """
    mf_r, mf_a = model_ref.functions, model_alt.functions
    ref_names = mf_r.variable_names
    n, k = mf_r.n_variables, mf_r.n_shocks

    vperm = _permutation(mf_a.variable_names, ref_names, "variables")
    sperm = _permutation(mf_a.shock_names, mf_r.shock_names, "shocks")

    upd_r = {k_: v for k_, v in updates.items()
             if k_ in model_ref.param_names}
    upd_a = {k_: v for k_, v in updates.items()
             if k_ in model_alt.param_names}
    unknown = set(updates) - set(upd_r) - set(upd_a)
    if unknown:
        raise KeyError(f"unknown parameter(s) {sorted(unknown)}")

    theta_r_free = model_ref.default_theta(**upd_r)
    ss = model_ref.ss_solver(jnp.asarray(theta_r_free))
    if not bool(ss.success):
        raise RuntimeError("reference-regime steady state failed to solve")
    x_ss = jnp.asarray(ss.x_ss)
    theta_r = jnp.asarray(ss.theta_full)

    theta_a_free = model_alt.default_theta(**upd_a)
    # the alternative regime has no steady state of its own: evaluate at the
    # reference SS.  Alternative-model calibrated params are unsupported.
    if mf_a.calibrated_params:
        raise ValueError("alternative-regime model may not use calibrated "
                         "(`->`) parameters")
    theta_a = jnp.asarray(mf_a.f_params(jnp.asarray(theta_a_free)))

    lin_r = make_linearizer(mf_r, False)(x_ss, theta_r)
    x_ss_alt = x_ss[jnp.asarray(vperm)]
    lin_a = make_linearizer(mf_a, False)(x_ss_alt, theta_a)
    # alt matrices have columns in ALT variable order; re-express in ref order
    col = jnp.asarray(vperm)
    A1 = lin_a.A[:, col]
    B1 = lin_a.B[:, col]
    C1 = lin_a.C[:, col]
    D1 = lin_a.D[:, jnp.asarray(sperm)]
    eps0 = jnp.zeros((k,), x_ss.dtype)
    c1 = jnp.asarray(mf_a.f_resid(x_ss_alt, x_ss_alt, x_ss_alt, eps0,
                                  x_ss_alt, theta_a))

    cr = cycle_reduction(lin_r.A, lin_r.B, lin_r.C)
    if not bool(cr.success):
        raise RuntimeError("reference-regime policy solve failed "
                           "(Blanchard-Kahn must hold in the slack regime)")
    T0 = cr.T

    bind_fn = _lower_condition(bind, mf_r)
    relax_fn = _lower_condition(relax, mf_r)

    eps_path = np.zeros((periods, k))
    if shocks:
        for name, path in shocks.items():
            if name not in mf_r.shock_names:
                raise KeyError(f"unknown shock {name!r}; shocks are "
                               f"{mf_r.shock_names}")
            j = mf_r.shock_names.index(name)
            path = np.asarray(path, dtype=float).ravel()
            m = min(len(path), periods)
            eps_path[:m, j] = path[:m]

    y0 = np.zeros(n)
    if initial_state:
        for name, val in initial_state.items():
            if name not in ref_names:
                raise KeyError(f"unknown variable {name!r} in initial_state")
            y0[ref_names.index(name)] = float(val)

    A = jnp.stack([lin_r.A, A1])
    B = jnp.stack([lin_r.B, B1])
    C = jnp.stack([lin_r.C, C1])
    D = jnp.stack([lin_r.D, D1])
    c = jnp.stack([jnp.zeros_like(c1), c1])

    core = jax.jit(_occbin_core,
                   static_argnames=("bind_fn", "relax_fn", "maxiter"))
    ys, mask, it, ok = core(
        jnp.asarray(y0, x_ss.dtype), jnp.asarray(eps_path, x_ss.dtype),
        A, B, C, D, c, T0, x_ss, theta_r,
        bind_fn=bind_fn.fn, relax_fn=relax_fn.fn, maxiter=maxiter)

    levels = np.asarray(x_ss)[None, :] + np.asarray(ys)
    df = pd.DataFrame(levels, columns=ref_names,
                      index=pd.RangeIndex(1, periods + 1, name="time"))
    return OccbinResult(df, np.asarray(mask).astype(np.int8),
                        bool(ok), int(it))


def occbin_irf(
    model_ref: Model,
    model_alt: Model,
    bind: str,
    relax: str,
    shock: str,
    sizes=(1.0, -1.0),
    periods: int = 60,
    maxiter: int = 100,
    **updates,
) -> pd.DataFrame:
    """Piecewise-linear IRFs: one OccBin path per shock size.

    The classic asymmetry diagnostic — e.g. at the ZLB a contractionary
    shock is amplified while an expansionary one is not, so +1/-1 sd
    responses are no longer mirror images.  Returns a DataFrame indexed by
    (size, time) with one column per variable in *deviations from the
    reference steady state* (comparable across sizes), plus a ``regime``
    column.
    """
    frames = []
    x_ss = None
    for size in sizes:
        res = solve_occbin(
            model_ref, model_alt, bind, relax, periods=periods,
            shocks={shock: np.array([float(size)])}, maxiter=maxiter,
            **updates)
        if not res.success:
            raise RuntimeError(
                f"occbin regime fixed point not reached for size {size}")
        if x_ss is None:
            theta = model_ref.default_theta(
                **{k: v for k, v in updates.items()
                   if k in model_ref.param_names})
            x_ss = np.asarray(model_ref.ss_solver(jnp.asarray(theta)).x_ss)
        dev = res.trajectory - x_ss[None, :]
        dev["regime"] = res.regime
        dev["size"] = float(size)
        frames.append(dev.reset_index())
    out = pd.concat(frames, ignore_index=True)
    return out.set_index(["size", "time"])
