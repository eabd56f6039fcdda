"""Inverse-free spectral divide-and-conquer for matrix pencils, on device.

XLA-TPU has no QZ/generalized-Schur primitive (SURVEY.md §2.5).  Instead of
porting LAPACK's Givens-chasing QZ (branch-heavy, sequential, hostile to the
MXU), the stable/unstable splitting that gensys actually needs is computed
with the **inverse-free disk-function iteration** of Bai, Demmel & Gu
(Numer. Math. 76, 1997): a repeated-squaring scheme built entirely from QR
factorizations and GEMMs — exactly the primitives XLA-TPU executes well —
with quadratic convergence and fully static shapes.

For a pencil (A, B) with generalized eigenvalues lambda (det(A - lambda B)=0),
one step of

    qr([[B_j], [-A_j]]) = Q [[R],[0]],   Q = [[Q11, Q12], [Q21, Q22]]
    A_{j+1} = Q12^H A_j,   B_{j+1} = Q22^H B_j

squares every eigenvalue (lambda -> lambda^2) while keeping the pencil
equivalent on deflating subspaces.  After j ~ 25 doublings, inside-the-disk
eigenvalues have collapsed to 0 and outside ones to infinity, and

    P_inside = (A_inf + B_inf)^{-1} B_inf

is the (oblique) projector onto the right deflating subspace for |lambda| < 1;
an SVD extracts an orthonormal basis and diagnoses the split dimension.
Everything is real arithmetic — complex eigenvalues come in conjugate pairs,
so the deflating subspaces are real.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["disk_function_split", "DiskSplitResult", "count_eigs_inside"]


class DiskSplitResult(NamedTuple):
    V_stable: jax.Array       # (n, k) orthonormal basis, right deflating
    #                           subspace for |lambda| < radius
    sv: jax.Array             # (n,) singular values of the projector (sorted
    #                           descending): ~1 on the subspace, ~0 off it
    n_inside: jax.Array       # detected subspace dimension
    converged: jax.Array      # bool


def _disk_projector(A, B, radius, n_iter):
    """Run the inverse-free iteration; return (P_inside, finite flag)."""
    n = A.shape[0]
    dtype = A.dtype
    A_j = A / radius
    B_j = B

    def body(carry, _):
        A_j, B_j = carry
        # normalize to keep magnitudes bounded (equivalence transform)
        s = jnp.maximum(jnp.linalg.norm(A_j, ord="fro"),
                        jnp.linalg.norm(B_j, ord="fro"))
        s = jnp.maximum(s, jnp.asarray(1e-300, dtype))
        A_n = A_j / s
        B_n = B_j / s
        stacked = jnp.concatenate([B_n, -A_n], axis=0)        # (2n, n)
        Q, _ = jnp.linalg.qr(stacked, mode="complete")         # (2n, 2n)
        Q12 = Q[:n, n:]
        Q22 = Q[n:, n:]
        A_next = Q12.T @ A_n
        B_next = Q22.T @ B_n
        return (A_next, B_next), None

    (A_inf, B_inf), _ = jax.lax.scan(body, (A_j, B_j), None, length=n_iter)

    # projector onto the inside deflating subspace: (A_inf + B_inf)^{-1} B_inf
    M = A_inf + B_inf
    P_in = jnp.linalg.solve(M, B_inf)
    finite = jnp.all(jnp.isfinite(P_in))
    return jnp.where(finite, P_in, jnp.zeros_like(P_in)), finite


@highest_precision
def count_eigs_inside(A, B, radius: float = 1.0, n_iter: int = 30):
    """Number of generalized eigenvalues of the pencil (A, B) with
    |lambda| < ``radius`` — fully on device, vmappable (no host callback).

    Infinite eigenvalues (singular B directions) land outside every disk,
    so ``n - n_inside`` counts unstable-plus-infinite roots: exactly the
    Blanchard-Kahn "explosive root" count (reference diagnostic:
    ``gEconpy/model/perturbation.py:412,448``, here via repeated disk
    splits instead of a host QZ/eig).  Returns ``(n_inside, ok)`` where
    ``ok`` flags a clean 0/1 singular-value gap of the projector — a draw
    with a root ON the split circle (|lambda| ~ radius) reports ok=False
    rather than a silently arbitrary count.
    """
    P_in, finite = _disk_projector(A, B, radius, n_iter)
    sv = jnp.linalg.svd(P_in, compute_uv=False)
    n_inside = jnp.sum(sv > 0.5)
    # oblique-projector singular values cluster at >=1 and ~0; anything in
    # the dead band means the iteration did not separate the spectra
    gap_ok = ~jnp.any((sv > 0.2) & (sv < 0.8))
    return n_inside, finite & gap_ok


@highest_precision
def disk_function_split(A, B, k_stable: int, radius: float = 1.0,
                        n_iter: int = 30) -> DiskSplitResult:
    """Right deflating subspace of the pencil (A, B) for |lambda| < radius.

    ``k_stable`` is the *expected* subspace dimension (static — for a
    determinate DSGE model it equals the number of non-explosive roots).  The
    detected dimension is returned so callers can flag indeterminacy /
    nonexistence when it differs.
    """
    n = A.shape[0]
    P_safe, finite = _disk_projector(A, B, radius, n_iter)

    # orthonormal basis of range(P_in): top singular vectors
    U, sv, _ = jnp.linalg.svd(P_safe)
    V_stable = U[:, :k_stable]

    # detected dimension: singular values of a projector are ~1 / ~0
    n_inside = jnp.sum(sv > 0.5)
    gap_ok = jnp.logical_and(
        sv[k_stable - 1] > 0.5 if k_stable > 0 else jnp.asarray(True),
        sv[k_stable] < 0.5 if k_stable < n else jnp.asarray(True),
    )
    converged = finite & gap_ok & (n_inside == k_stable)
    return DiskSplitResult(V_stable, sv, n_inside, converged)
