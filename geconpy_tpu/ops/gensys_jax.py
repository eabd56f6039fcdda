"""gensys (Sims 2002) fully on device — no host QZ.

The reference's gensys core is a numba/LAPACK complex QZ with eigenvalue
sorting (``gEconpy/solvers/gensys.py:190``).  XLA-TPU has no QZ, so this
implementation replaces the ordered Schur form with the **inverse-free disk
split** (:mod:`geconpy_tpu.ops.qz_disk`): gensys never needs triangular QZ
factors — only

  1. the stable/unstable *partition* of the pencil (right deflating subspace
     Z, compatible left basis Q), and
  2. SVD-based existence/uniqueness tests on the unstable-block loadings of
     the expectational errors,

both of which work with a block (non-triangular) ordered decomposition.  All
shapes are static: the number of expectational errors (= lead variables) is
a structural fact fixed at model-build time, and for a determinate model the
stable subspace has dimension m - n_leads.  Failures (wrong split dimension,
rank-deficient eta loadings = indeterminacy, no solution) surface as eu
flags, never exceptions — so the solver vmaps over MCMC draws.

Validated against the scipy-ordqz oracle (:mod:`geconpy_tpu.ops.gensys_np`)
at 1e-8 on every bundled forward-looking model — including the 33-variable
SW-2007 flagship (tests/ops/test_gensys_jax.py) — and against real Dynare
output at 1e-5 (tests/parity/test_dynare_parity.py).  Backward-looking
models have no expectational block and use the direct solver.

Stability divider: the host oracle ports Sims's adaptive ``div``
(``ops/gensys_np.py``), which shrinks the divider below the smallest root
larger than 1.  The device solver uses a fixed split radius (default 1.01)
instead: the disk iteration needs its radius at trace time, and a draw with
a root inside the ambiguous band [1, div) makes the detected split dimension
disagree with the structural lead count, which flags ``success=False`` — the
draw is *rejected*, never silently mis-solved.  For estimation workloads
(vmapped draws, logp gating on flags) rejection is the correct behavior; an
adaptive retry would double the batched cost for every draw to rescue a
measure-zero band.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .precision import highest_precision
from .qz_disk import disk_function_split

__all__ = ["gensys_jax", "make_gensys_solver", "GensysJaxResult"]

_RANK_TOL = 1e-9


class GensysJaxResult(NamedTuple):
    T: jax.Array              # (n, n) transition (original variables)
    R: jax.Array              # (n, n_shocks) impact
    existence: jax.Array      # bool
    uniqueness: jax.Array     # bool
    success: jax.Array        # existence & uniqueness & finite
    split_dim: jax.Array      # detected stable-subspace dimension


def _orth_complete(V):
    """Full orthonormal basis [V | V_perp] from an orthonormal block V."""
    Q, _ = jnp.linalg.qr(V, mode="complete")
    # QR of an orthonormal matrix returns itself up to column signs; use Q
    return Q


@partial(jax.jit, static_argnames=("n_orig", "n_leads", "div", "n_iter"))
@highest_precision
def gensys_jax(g0, g1, psi, pi, n_orig: int, n_leads: int,
               div: float = 1.01, n_iter: int = 30) -> GensysJaxResult:
    """Solve  g0 y_t = g1 y_{t-1} + psi z_t + pi eta_t  on device.

    ``n_orig`` is the original variable count (T, R are returned restricted
    to it); ``n_leads`` the number of auxiliary lead states / expectational
    errors (static).
    """
    m = g0.shape[0]
    dtype = g0.dtype
    ns = m - n_leads         # stable dimension under determinacy
    ku = n_leads
    n_shocks = psi.shape[1]

    # ---- spectral split of the transition pencil (g1, g0): stable inside
    split = disk_function_split(g1, g0, k_stable=ns, radius=div,
                                n_iter=n_iter)
    V = split.V_stable                                    # (m, ns)
    Zfull = _orth_complete(V)                             # (m, m)

    # left basis: U1 spans [g0 V, g1 V]
    W = jnp.concatenate([g0 @ V, g1 @ V], axis=1)         # (m, 2 ns)
    Uw, _, _ = jnp.linalg.svd(W, full_matrices=False)
    U1 = Uw[:, :ns]
    Qfull = _orth_complete(U1)                            # (m, m)

    a = Qfull.T @ g0 @ Zfull                              # block upper-tri
    b = Qfull.T @ g1 @ Zfull
    qh = Qfull.T
    q1 = qh[:ns, :]
    q2 = qh[ns:, :]

    # ---- existence / uniqueness via SVDs of eta loadings
    etawt = q2 @ pi                                       # (ku, n_eta=ku)
    ueta, deta, vetah = jnp.linalg.svd(etawt, full_matrices=False)
    scale = jnp.maximum(deta[0], jnp.asarray(1e-30, dtype)) if ku else None

    if ku:
        rank_full = deta[-1] > _RANK_TOL * jnp.maximum(deta[0], 1.0)
        inv_deta = jnp.where(deta > _RANK_TOL * jnp.maximum(deta[0], 1.0),
                             1.0 / jnp.maximum(deta, 1e-300), 0.0)
        veta = vetah.T
        # existence: unstable shock loadings lie in span(ueta)
        zwt = q2 @ psi
        resid_exist = zwt - ueta @ (ueta.T @ zwt)
        existence = jnp.linalg.norm(resid_exist) < 1e-7 * (
            1.0 + jnp.linalg.norm(zwt))
        # uniqueness: no loose expectational errors in the stable block
        etawt1 = q1 @ pi
        loose = etawt1 @ (jnp.eye(ku, dtype=dtype) - veta @ veta.T)
        uniqueness = rank_full & (
            jnp.linalg.norm(loose) < 1e-7 * (1.0 + jnp.linalg.norm(etawt1)))

        ueta1, deta1, veta1h = jnp.linalg.svd(etawt1, full_matrices=False)
        inner = (ueta * inv_deta[None, :]) @ vetah \
            @ veta1h.T @ (jnp.diag(deta1) @ ueta1.T)
        tmat = jnp.concatenate([jnp.eye(ns, dtype=dtype), -inner.T], axis=1)
    else:
        existence = jnp.asarray(True)
        uniqueness = jnp.asarray(True)
        tmat = jnp.eye(ns, dtype=dtype)

    # ---- assemble the solution (block form; no triangularity needed)
    G0 = jnp.concatenate([
        tmat @ a,
        jnp.concatenate([jnp.zeros((ku, ns), dtype),
                         jnp.eye(ku, dtype=dtype)], axis=1),
    ], axis=0)
    G1_raw = jnp.concatenate([tmat @ b, jnp.zeros((ku, m), dtype)], axis=0)
    impact_raw = jnp.concatenate([
        tmat @ (qh @ psi), jnp.zeros((ku, n_shocks), dtype)], axis=0)

    G1 = jnp.linalg.solve(G0, G1_raw)
    impact = jnp.linalg.solve(G0, impact_raw)

    G1 = Zfull @ G1 @ Zfull.T
    impact = Zfull @ impact

    T = G1[:n_orig, :n_orig]
    R = impact[:n_orig, :]

    finite = jnp.all(jnp.isfinite(T)) & jnp.all(jnp.isfinite(R))
    # fold the spectral-split count into the eu codes: too many stable roots
    # means indeterminacy (sunspots), too few means no stable solution
    existence = existence & (split.n_inside >= ns)
    uniqueness = uniqueness & (split.n_inside <= ns)
    success = split.converged & existence & uniqueness & finite
    return GensysJaxResult(T, R, existence, uniqueness, success,
                           split.n_inside)


def make_gensys_solver(n_vars: int, lead_idx: np.ndarray, n_shocks: int,
                       div: float = 1.01):
    """Build a jittable ``solve(A, B, C, D) -> GensysJaxResult``.

    ``lead_idx`` (structural, from the symbolic C-column incidence) fixes the
    augmented-system layout at build time — same role as the reference's
    ``_gensys_setup`` (``gEconpy/solvers/gensys.py:568``) but with static
    shapes so the whole solve jits and vmaps.
    """
    lead_idx = np.asarray(lead_idx, dtype=np.int64)
    k = len(lead_idx)
    m = n_vars + k
    lead_idx_j = jnp.asarray(lead_idx, dtype=jnp.int32)

    # static masks for assembling g0, g1, pi
    pi_np = np.zeros((m, k))
    for row, j in enumerate(lead_idx):
        pi_np[n_vars + row, row] = 1.0
    g1_aux_np = np.zeros((m, m))
    for row in range(k):
        g1_aux_np[n_vars + row, n_vars + row] = 1.0

    def solve(A, B, C, D) -> GensysJaxResult:
        dtype = A.dtype
        g0 = jnp.zeros((m, m), dtype)
        g0 = g0.at[:n_vars, :n_vars].set(-B)
        g0 = g0.at[:n_vars, n_vars:].set(-C[:, lead_idx_j])
        # expectational rows:  y_{j,t} = w_{j,t-1} + eta_{j,t}
        g0 = g0.at[jnp.arange(n_vars, m), lead_idx_j].set(1.0)

        g1 = jnp.asarray(g1_aux_np, dtype)
        g1 = g1.at[:n_vars, :n_vars].set(A)

        psi = jnp.zeros((m, D.shape[1]), dtype).at[:n_vars, :].set(D)
        pi = jnp.asarray(pi_np, dtype)
        return gensys_jax(g0, g1, psi, pi, n_orig=n_vars, n_leads=k, div=div)

    return solve
