"""Pallas TPU kernel: batched cycle reduction in vector-lane layout.

The policy solve's dominant cost is the batched small LU solve inside each
cycle-reduction iteration — XLA lowers (batch, n, 2n) pivoted LU poorly for
n ~ 25.  This kernel keeps the whole iteration on-chip with the batch in the
128-lane dimension and replaces the batched LU with **Gauss-Jordan
elimination with per-lane partial pivoting**: each draw independently
argmaxes its remaining pivot column and swaps rows via one-hot masked
writes, so the elimination is LU-stable for every batch element without
any data movement off the VPU lanes (the DSGE pencil's B matrix has
structural zero pivots, so pivoting is required, and near-unit-root draws
develop small pivots mid-iteration that a static ordering cannot fix).

The minimum |pivot| encountered and the final lag/lead tail norms fold
into the success flag, so genuinely singular draws are rejected (flagged)
instead of silently degrading — the XLA path remains the default for
gradient-bearing work.

Every operation is an n^3-FMA lane contraction — pure VPU work with zero
HBM traffic between iterations.  Role parity with
``gEconpy/solvers/cycle_reduction.py`` (cycle_reduction_numpy:23); this is
the batched fast path used by prior/posterior sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pallas_cycle_reduction", "pallas_cycle_reduction_policy",
           "static_pivot_order"]


def static_pivot_order(B_calib: np.ndarray) -> np.ndarray:
    """Host-side row ordering from one pivoted LU at the calibration point.

    Returns ``order`` such that ``A[order]`` has nonzero leading pivots for
    pivot-free elimination.  The sparsity pattern of the DSGE pencil is
    structural, so this ordering is valid for the whole parameter region
    (guarded by the kernel's min-|pivot| success flag).
    """
    import scipy.linalg as sla

    P, _, _ = sla.lu(np.asarray(B_calib, dtype=np.float64))
    # P @ L @ U = B  =>  P.T @ B = L @ U ; rows of B in elimination order
    return np.argmax(P.T, axis=1).astype(np.int32)


def _mm(A, B, n=None):
    """Lane-layout matmul: (r,c,BT) @ (c,m,BT) -> (r,m,BT).

    Sum of outer products over the contraction index; extraction is done
    with one-hot masks (Mosaic TPU has no dynamic_slice inside kernels).
    """
    c = A.shape[1]
    rows_a = jax.lax.broadcasted_iota(jnp.int32, A.shape[:2], 1)[..., None]
    rows_b = jax.lax.broadcasted_iota(jnp.int32, B.shape[:2], 0)[..., None]
    zero_a = jnp.zeros_like(A)
    zero_b = jnp.zeros_like(B)

    def step(l, acc):
        a_col = jnp.sum(jnp.where(rows_a == l, A, zero_a), axis=1)  # (r, BT)
        b_row = jnp.sum(jnp.where(rows_b == l, B, zero_b), axis=0)  # (m, BT)
        return acc + a_col[:, None, :] * b_row[None, :, :]

    return jax.lax.fori_loop(0, c, step, jnp.zeros(
        (A.shape[0],) + B.shape[1:], B.dtype))


def _mmT(A, B):
    """Lane-layout A @ B^T: (r,c,BT) x (m,c,BT) -> (r,m,BT)."""
    c = A.shape[1]
    cols_a = jax.lax.broadcasted_iota(jnp.int32, A.shape[:2], 1)[..., None]
    cols_b = jax.lax.broadcasted_iota(jnp.int32, B.shape[:2], 1)[..., None]
    zero_a = jnp.zeros_like(A)
    zero_b = jnp.zeros_like(B)

    def step(l, acc):
        a_col = jnp.sum(jnp.where(cols_a == l, A, zero_a), axis=1)  # (r, BT)
        b_col = jnp.sum(jnp.where(cols_b == l, B, zero_b), axis=1)  # (m, BT)
        return acc + a_col[:, None, :] * b_col[None, :, :]

    return jax.lax.fori_loop(0, c, step, jnp.zeros(
        (A.shape[0], B.shape[0], A.shape[-1]), A.dtype))


def _gj_solve(A1, RHS, n, with_logdet: bool = False):
    """Partially-pivoted Gauss-Jordan:
    (n,n,BT), (n,m,BT) -> (A1^{-1} RHS, min|piv|[, log|det A1|]).

    Per-lane partial pivoting: each batch element independently argmaxes
    its remaining column, swaps via one-hot masked writes, then the pivot
    row is normalized and eliminated from every other row with one
    lane-broadcast rank-1 update.  All row/column movement is one-hot
    masked reductions — no dynamic slicing (unsupported in Mosaic).
    """
    aug = jnp.concatenate([A1, RHS], axis=1)          # (n, n+m, BT)
    bt = aug.shape[-1]
    m = aug.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)[..., None]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)[..., None]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    zero = jnp.zeros_like(aug)

    def step(k, carry):
        aug, minpiv, logdet = carry
        colk = jnp.sum(jnp.where(cols == k, aug, zero), axis=1)   # (n, BT)
        # per-lane pivot choice among rows >= k
        mag = jnp.where(rows1 >= k, jnp.abs(colk),
                        jnp.full_like(colk, -1.0))
        p = jnp.argmax(mag, axis=0)                               # (BT,)
        pmask = rows1 == p[None, :]                               # (n, BT)
        row_p = jnp.sum(jnp.where(pmask[:, None, :], aug, zero),
                        axis=0)                                   # (m, BT)
        row_k = jnp.sum(jnp.where(rows == k, aug, zero), axis=0)  # (m, BT)
        # swap rows k and p (identical writes when p == k)
        aug = jnp.where(rows == k, row_p[None, :, :], aug)
        aug = jnp.where(pmask[:, None, :], row_k[None, :, :], aug)

        piv = jnp.sum(jnp.where(cols1 == k, row_p,
                                jnp.zeros_like(row_p)), axis=0)   # (BT,)
        r = row_p / piv[None, :]
        # column k after the swap: entry p picks up old aug[k, k]
        colk_k = jnp.sum(jnp.where(rows1 == k, colk,
                                   jnp.zeros_like(colk)), axis=0)  # (BT,)
        col = jnp.where(pmask, colk_k[None, :], colk)
        col = jnp.where(rows1 == k, jnp.zeros_like(col), col)
        aug = aug - col[:, None, :] * r[None, :, :]
        aug = jnp.where(rows == k, r[None, :, :], aug)
        return (aug, jnp.minimum(minpiv, jnp.abs(piv)),
                logdet + jnp.log(jnp.abs(piv)))

    aug, minpiv, logdet = jax.lax.fori_loop(
        0, n, step, (aug, jnp.full((bt,), jnp.inf, aug.dtype),
                     jnp.zeros((bt,), aug.dtype)))
    if with_logdet:
        return aug[:, n:], minpiv, logdet
    return aug[:, n:], minpiv


def _cr_kernel(A_ref, B_ref, C_ref, T_ref, flag_ref, *, n: int, n_iter: int):
    A0 = A_ref[...]
    A1 = B_ref[...]
    A2 = C_ref[...]
    bt = A0.shape[-1]
    A0_orig = A0
    Ahat = A1
    minpiv0 = jnp.full((bt,), jnp.inf, A0.dtype)

    def body(_, carry):
        A0, A1, A2, Ahat, minpiv = carry
        sol, mp = _gj_solve(A1, jnp.concatenate([A0, A2], axis=1), n)
        Q0 = sol[:, :n]
        Q2 = sol[:, n:]
        A1_new = A1 - _mm(A0, Q2, n) - _mm(A2, Q0, n)
        Ahat_new = Ahat - _mm(A2, Q0, n)
        A0_new = -_mm(A0, Q0, n)
        A2_new = -_mm(A2, Q2, n)
        return (A0_new, A1_new, A2_new, Ahat_new, jnp.minimum(minpiv, mp))

    A0f, _, A2f, Ahatf, minpiv = jax.lax.fori_loop(
        0, n_iter, body, (A0, A1, A2, Ahat, minpiv0))

    T, mp_final = _gj_solve(Ahatf, -A0_orig, n)
    T_ref[...] = T

    tail = jnp.max(jnp.abs(A0f), axis=(0, 1)) + jnp.max(jnp.abs(A2f),
                                                        axis=(0, 1))
    flag_ref[...] = jnp.stack([jnp.minimum(minpiv, mp_final), tail])


def _cr_sel_kernel(A_ref, B_ref, C_ref, D_ref, T_ref, R_ref, flag_ref, *,
                   n: int, n_iter: int):
    """Cycle reduction + reduced selection matrix R = -(B + C T)^{-1} D
    and the policy residual  max|A + B T + C T^2|  (success evidence
    without any XLA-side recomputation)."""
    A0 = A_ref[...]
    A1 = B_ref[...]
    A2 = C_ref[...]
    D = D_ref[...]
    bt = A0.shape[-1]
    A0_orig, B_orig, C_orig = A0, A1, A2
    Ahat = A1
    minpiv0 = jnp.full((bt,), jnp.inf, A0.dtype)

    def body(_, carry):
        A0, A1, A2, Ahat, minpiv = carry
        sol, mp = _gj_solve(A1, jnp.concatenate([A0, A2], axis=1), n)
        Q0 = sol[:, :n]
        Q2 = sol[:, n:]
        A1_new = A1 - _mm(A0, Q2, n) - _mm(A2, Q0, n)
        Ahat_new = Ahat - _mm(A2, Q0, n)
        A0_new = -_mm(A0, Q0, n)
        A2_new = -_mm(A2, Q2, n)
        return (A0_new, A1_new, A2_new, Ahat_new, jnp.minimum(minpiv, mp))

    A0f, _, A2f, Ahatf, minpiv = jax.lax.fori_loop(
        0, n_iter, body, (A0, A1, A2, Ahat, minpiv0))

    T, mp_final = _gj_solve(Ahatf, -A0_orig, n)
    T_ref[...] = T

    CT = _mm(C_orig, T)
    M = B_orig + CT
    R, mp_sel = _gj_solve(M, -D, n)
    R_ref[...] = R

    resid = jnp.max(jnp.abs(A0_orig + _mm(M, T)), axis=(0, 1))
    tail = jnp.max(jnp.abs(A0f), axis=(0, 1)) + jnp.max(jnp.abs(A2f),
                                                        axis=(0, 1))
    flag_ref[...] = jnp.stack(
        [jnp.minimum(jnp.minimum(minpiv, mp_final), mp_sel), tail, resid])


def pallas_cycle_reduction(A, B, C, order: np.ndarray | None = None,
                           n_iter: int = 16, tile: int = 128,
                           tol: float | None = None,
                           min_pivot: float = 1e-7,
                           interpret: bool = False):
    """Batched cycle reduction: (B, n, n) x3 -> (T, success).

    ``order`` optionally pre-permutes equations (e.g. from
    :func:`static_pivot_order`) — unnecessary for correctness now that the
    elimination pivots per lane, but kept for reduced early-step growth.
    Permuting equations leaves the solvent T unchanged.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, n, _ = A.shape
    dtype = A.dtype
    if tol is None:
        tol = 200 * float(np.finfo(np.dtype(dtype)).eps)
    if order is not None:
        idx = jnp.asarray(order)
        A, B, C = A[:, idx], B[:, idx], C[:, idx]
    n_orig = n
    if n < 8:
        # Mosaic mis-lowers sub-sublane dims: embed into an identity-padded
        # decoupled system (T pad block is exactly zero, pivots are 1)
        ext = 8 - n

        def embed(M, diag):
            out = jnp.zeros(M.shape[:1] + (8, 8), dtype)
            out = out.at[:, :n, :n].set(M)
            if diag:
                out = out.at[:, n:, n:].set(jnp.eye(ext, dtype=dtype))
            return out

        A = embed(A, False)
        B = embed(B, True)
        C = embed(C, False)
        n = 8
    pad = (-Bn) % tile
    Bp = Bn + pad

    def to_lanes(a):
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dtype)], axis=0) if pad else a
        return jnp.transpose(a, (1, 2, 0))

    A_l, B_l, C_l = (to_lanes(m) for m in (A, B, C))
    # padding lanes carry identity systems so the elimination stays finite
    if pad:
        eye_pad = jnp.eye(n, dtype=dtype)[:, :, None]
        B_l = B_l.at[:, :, Bn:].add(eye_pad)

    n_tiles = Bp // tile
    kernel = functools.partial(_cr_kernel, n=n, n_iter=n_iter)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )

    T_l, flags = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n, n, Bp), dtype),
                   jax.ShapeDtypeStruct((2, Bp), dtype)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(A_l, B_l, C_l)

    T = jnp.transpose(T_l, (2, 0, 1))[:Bn, :n_orig, :n_orig]
    minpiv = flags[0, :Bn]
    tail = flags[1, :Bn]
    success = jnp.isfinite(tail) & (tail < tol) & (minpiv > min_pivot) \
        & jnp.all(jnp.isfinite(T), axis=(1, 2))
    return T, success


def pallas_cycle_reduction_policy(A, B, C, D, order: np.ndarray | None = None,
                                  n_iter: int = 16, tile: int = 128,
                                  tol: float | None = None,
                                  min_pivot: float = 1e-7,
                                  interpret: bool = False):
    """Batched full policy solve on the (reduced) pencil:
    (B,n,n) x3, (B,n,m) -> (T, R, success, resid).

    Adds the shock-selection solve ``R = -(B + C T)^{-1} D`` and the policy
    residual ``max|A + B T + C T^2|`` to the cycle-reduction kernel, so the
    batched sweep path needs no XLA-side selection solve or residual
    recomputation.  ``success`` folds pivots, tail contraction, and the
    residual (dtype-aware thresholds).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .tolerances import success_tol

    Bn, n, _ = A.shape
    m = D.shape[-1]
    dtype = A.dtype
    if tol is None:
        tol = 200 * float(np.finfo(np.dtype(dtype)).eps)
    resid_tol = float(success_tol(dtype, 1e-6))
    if order is not None:
        idx = jnp.asarray(order)
        A, B, C, D = A[:, idx], B[:, idx], C[:, idx], D[:, idx]
    n_orig = n
    if n < 8:
        # Mosaic mis-lowers sub-sublane dims: embed into an identity-padded
        # decoupled system (T/R pad block is exactly zero, pivots are 1)
        ext = 8 - n

        def embed(M, diag):
            out = jnp.zeros(M.shape[:1] + (8, 8), dtype)
            out = out.at[:, :n, :n].set(M)
            if diag:
                out = out.at[:, n:, n:].set(jnp.eye(ext, dtype=dtype))
            return out

        A = embed(A, False)
        B = embed(B, True)
        C = embed(C, False)
        D = jnp.concatenate([D, jnp.zeros((Bn, ext, m), dtype)], axis=1)
        n = 8
    pad = (-Bn) % tile
    Bp = Bn + pad

    def to_lanes(a):
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dtype)], axis=0) if pad else a
        return jnp.transpose(a, (1, 2, 0))

    A_l, B_l, C_l, D_l = (to_lanes(x) for x in (A, B, C, D))
    if pad:
        eye_pad = jnp.eye(n, dtype=dtype)[:, :, None]
        B_l = B_l.at[:, :, Bn:].add(eye_pad)

    n_tiles = Bp // tile
    kernel = functools.partial(_cr_sel_kernel, n=n, n_iter=n_iter)

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (tile,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[spec(n, n), spec(n, n), spec(n, n), spec(n, m)],
        out_specs=[spec(n, n), spec(n, m), spec(3)],
    )

    T_l, R_l, flags = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n, n, Bp), dtype),
                   jax.ShapeDtypeStruct((n, m, Bp), dtype),
                   jax.ShapeDtypeStruct((3, Bp), dtype)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(A_l, B_l, C_l, D_l)

    T = jnp.transpose(T_l, (2, 0, 1))[:Bn, :n_orig, :n_orig]
    R = jnp.transpose(R_l, (2, 0, 1))[:Bn, :n_orig, :]
    minpiv = flags[0, :Bn]
    tail = flags[1, :Bn]
    resid = flags[2, :Bn]
    success = jnp.isfinite(tail) & (tail < tol) & (minpiv > min_pivot) \
        & jnp.isfinite(resid) & (resid < resid_tol) \
        & jnp.all(jnp.isfinite(T), axis=(1, 2)) \
        & jnp.all(jnp.isfinite(R), axis=(1, 2))
    return T, R, success, resid
