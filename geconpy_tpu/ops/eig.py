"""Differentiable eigenvalues of a real (nonsymmetric) matrix.

XLA-TPU has no nonsymmetric eigendecomposition, so the factorization runs
in a host callback (``jax.pure_callback``) — this is a *diagnostics* path
(BK eigenvalue tables, parameter sensitivity), not the estimation hot loop.
The gradient is analytic and exact for simple eigenvalues:

    dλ_k = y_kᵀ dM x_k          (x_k right eigvec, y_kᵀ the k-th row of V⁻¹)

so the VJP with real cotangents (re_bar, im_bar) is

    M_bar = Re( (V diag(re_bar − i·im_bar) V⁻¹)ᵀ ).

Role parity with the reference's differentiable RealEig op
(``gEconpy/pytensorf/real_eig.py:10,105``) — redesigned as a pure_callback +
``custom_vjp`` pair instead of a pytensor Op with numba/JAX dispatch.

Eigenvalues are sorted by modulus (ascending), matching the reference's
convention; the backward callback recomputes the decomposition with the same
deterministic sort, so primal and adjoint orderings agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["eig_vals"]


def _host_eig_sorted(M: np.ndarray):
    lam, V = np.linalg.eig(np.asarray(M, dtype=np.float64))
    order = np.argsort(np.abs(lam), kind="stable")
    return lam[order], V[:, order]


def _eig_fwd_host(M):
    lam, _ = _host_eig_sorted(M)
    return (np.real(lam).astype(M.dtype), np.imag(lam).astype(M.dtype))


def _eig_bwd_host(M, re_bar, im_bar):
    _, V = _host_eig_sorted(M)
    c = np.asarray(re_bar, np.float64) - 1j * np.asarray(im_bar, np.float64)
    M_bar = (V @ np.diag(c) @ np.linalg.inv(V)).T
    return np.ascontiguousarray(np.real(M_bar).astype(M.dtype))


@jax.custom_vjp
def eig_vals(M):
    """Eigenvalues of a real square matrix, sorted by modulus (ascending).

    Returns ``(re, im)``.  Differentiable (exact analytic VJP for simple
    eigenvalues); both passes run on the host.
    """
    n = M.shape[0]
    out_shape = (jax.ShapeDtypeStruct((n,), M.dtype),
                 jax.ShapeDtypeStruct((n,), M.dtype))
    return jax.pure_callback(_eig_fwd_host, out_shape, M, vmap_method="sequential")


def _eig_vals_fwd(M):
    return eig_vals(M), M


def _eig_vals_bwd(M, cotangents):
    re_bar, im_bar = cotangents
    M_bar = jax.pure_callback(
        _eig_bwd_host, jax.ShapeDtypeStruct(M.shape, M.dtype),
        M, re_bar, im_bar, vmap_method="sequential")
    return (M_bar,)


eig_vals.defvjp(_eig_vals_fwd, _eig_vals_bwd)
