"""First-order (log-)linearization around the steady state.

Role parity with ``gEconpy/model/perturbation.py`` (linearize_model:29,
make_not_loglin_flags:201, check_perturbation_solution:383,
statespace_to_gEcon_representation:321).

TPU-first design: the reference differentiates equations *symbolically*
(sympy) and compiles the Jacobian entries; here the lowered residual function
is differentiated with ``jax.jacfwd`` at trace time — exact, fast to build,
and the resulting A/B/C/D evaluation fuses into one XLA program with the
downstream policy solve, so per-draw estimation gets a single kernel.

Convention:  A ŷ_{t-1} + B ŷ_t + C ŷ_{t+1} + D ε_t = 0, where ŷ is the log
deviation for log-linearized variables (positive steady state) and the level
deviation otherwise.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precision import highest_precision

from ..codegen.model_functions import ModelFunctions

__all__ = ["make_linearizer", "LinearizationResult", "solve_policy_backward",
           "spectral_radius", "gecon_matrices"]

_ZERO_TOL = 1e-8


class LinearizationResult(NamedTuple):
    A: jax.Array
    B: jax.Array
    C: jax.Array
    D: jax.Array
    loglin_scale: jax.Array  # per-variable column scale actually applied


def make_loglin_mask(mf: ModelFunctions,
                     loglin_variables: list[str] | bool = True) -> np.ndarray:
    """Static per-variable log-linearization request mask.

    True (the gEcon default) requests log deviations for every variable;
    False means level deviations throughout; a list selects by base name.
    A requested variable still falls back to levels at runtime when its
    steady state is not strictly positive (see ``make_linearizer``).
    """
    n = mf.n_variables
    if loglin_variables is True:
        return np.ones(n, dtype=bool)
    if loglin_variables is False:
        return np.zeros(n, dtype=bool)
    requested = set(loglin_variables)
    unknown = requested - set(mf.variable_names)
    if unknown:
        raise ValueError(f"loglin_variables not in model: {sorted(unknown)}")
    return np.array([v in requested for v in mf.variable_names])


def make_linearizer(
    mf: ModelFunctions,
    loglin_variables: list[str] | bool = True,
) -> Callable[[jax.Array, jax.Array], LinearizationResult]:
    """Build ``linearize(x_ss, theta_full) -> (A, B, C, D)``.

    ``loglin_variables`` is True (log-linearize everything with a positive
    steady state — the gEcon default), False (pure linearization), or an
    explicit list of variable base names.

    Variables whose steady state is near zero or negative fall back to level
    deviations (scale 1), mirroring the reference's ``make_not_loglin_flags``
    — but as a runtime ``where`` on device, so the same compiled program
    serves every parameter draw.
    """
    loglin_mask_j = jnp.asarray(make_loglin_mask(mf, loglin_variables))
    n = mf.n_variables
    k = mf.n_shocks

    use_symbolic = mf.f_lin_nz is not None and len(mf.lin_rows)
    if not use_symbolic:
        f = mf.f_resid
        jac_lag = jax.jacfwd(f, argnums=0)
        jac_now = jax.jacfwd(f, argnums=1)
        jac_lead = jax.jacfwd(f, argnums=2)
        jac_eps = jax.jacfwd(f, argnums=3)
        # note: SS-symbol references (argnum 4) are constants of the
        # linearization, not dynamic variables — no Jacobian w.r.t. them
    else:
        rows = jnp.asarray(mf.lin_rows)
        cols = jnp.asarray(mf.lin_cols)

    def linearize(x_ss: jax.Array, theta_full: jax.Array) -> LinearizationResult:
        eps0 = jnp.zeros((mf.n_shocks,), dtype=x_ss.dtype)
        args = (x_ss, x_ss, x_ss, eps0, x_ss, theta_full)
        if use_symbolic:
            # sparse symbolic Jacobian entries (shared CSE, lowered at
            # build — reference: gEconpy/model/compile.py:163) scattered
            # into the stacked [A | B | C | D] at static indices: ~5x
            # cheaper per draw than jacfwd over every input dimension
            vals = mf.f_lin_nz(*args)
            big = jnp.zeros((n, 3 * n + k), x_ss.dtype).at[rows, cols].set(
                vals)
            A = big[:, :n]
            B = big[:, n:2 * n]
            C = big[:, 2 * n:3 * n]
            D = big[:, 3 * n:]
        else:
            A = jac_lag(*args)
            B = jac_now(*args)
            C = jac_lead(*args)
            D = jac_eps(*args)
        # chain rule for log deviations: dF/d(log y) = dF/dy * y_ss, guarded
        # against non-positive steady states
        scale = jnp.where(loglin_mask_j & (x_ss > _ZERO_TOL), x_ss,
                          jnp.ones_like(x_ss))
        A = A * scale[None, :]
        B = B * scale[None, :]
        C = C * scale[None, :]
        return LinearizationResult(A, B, C, D, scale)

    return linearize


@highest_precision
def solve_policy_backward(A, B, D):
    """Policy for purely backward-looking models (no t+1 terms):
    T = -B⁻¹A, R = -B⁻¹D.

    Role parity with ``gEconpy/solvers/backward_looking.py:102``.
    """
    T = -jnp.linalg.solve(B, A)
    R = -jnp.linalg.solve(B, D)
    success = jnp.all(jnp.isfinite(T)) & jnp.all(jnp.isfinite(R))
    return T, R, success


@highest_precision
def spectral_radius(T, n_squarings: int = 10):
    """Largest |eigenvalue| of T via the Gelfand formula
    ρ(T) = lim_k ||T^k||^{1/k}, computed by repeated squaring with
    log-rescaling (k = 2^n_squarings).  Device-friendly stability check —
    XLA-TPU has no nonsymmetric eig primitive; the rigorous BK eigenvalue
    count lives in the QZ/gensys path.
    """
    norm0 = jnp.linalg.norm(T, ord="fro")
    M0 = T / jnp.maximum(norm0, 1e-300)
    logc0 = jnp.log(jnp.maximum(norm0, 1e-300))

    def body(carry, _):
        M, logc = carry
        M2 = M @ M
        nrm = jnp.linalg.norm(M2, ord="fro")
        logc = 2.0 * logc + jnp.log(jnp.maximum(nrm, 1e-300))
        return (M2 / jnp.maximum(nrm, 1e-300), logc), None

    (_, logc), _ = jax.lax.scan(body, (M0, logc0), None, length=n_squarings)
    return jnp.exp(logc / (2.0 ** n_squarings))


def gecon_matrices(T, R, variables, equations_incidence=None):
    """Split the solution into gEcon's P/Q/R/S blocks.

    gEcon reports the policy partitioned by state (appears with a lag) vs
    jump variables:  states_t = P states_{t-1} + Q eps_t;
    jumps_t = R' states_{t-1} + S eps_t.  Returns (P, Q, R_out, S, state_idx,
    jump_idx).  Host-side convenience for reporting/parity tests.
    """
    Tn = np.asarray(T)
    Rn = np.asarray(R)
    n = Tn.shape[0]
    state_idx = np.flatnonzero(np.abs(Tn).max(axis=0) > 1e-10)
    jump_idx = np.setdiff1d(np.arange(n), state_idx)
    P = Tn[np.ix_(state_idx, state_idx)]
    Q = Rn[state_idx, :]
    R_out = Tn[np.ix_(jump_idx, state_idx)]
    S = Rn[jump_idx, :]
    return P, Q, R_out, S, state_idx, jump_idx
