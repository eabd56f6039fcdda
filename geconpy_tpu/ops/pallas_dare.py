"""Pallas TPU kernel: batched DARE fixed point in vector-lane layout.

The stationary Kalman filter (``ops/kalman.py::stationary_kalman_loglik``)
needs the predictive-covariance fixed point P∞ of the discrete algebraic
Riccati equation per parameter draw.  The XLA settle (doubling Lyapunov +
Hewer gain iterations) runs as thousands of batched (n, n) matmuls that
badly underutilize the MXU at DSGE sizes (n ~ 26 « 128 lanes); this kernel
runs the identical schedule with the **batch in the 128-lane dimension**
(same layout as :mod:`geconpy_tpu.ops.pallas_cycle_reduction`):

- closed-loop Lyapunov solves by fixed-length Smith doubling
  (``P += A P Aᵀ; A = A²`` — 2^iters periods, machine-exact for stable A);
- Hewer gain iterations: S = Z P Zᵀ + H inverted with the per-lane
  partially-pivoted Gauss-Jordan, predictive gain Kp = T P Zᵀ S⁻¹,
  closed-loop A_cl = T − Kp Z, noise Q_c = RQR + Kp H Kpᵀ, then an inner
  doubling solve — globally quadratically convergent from the stabilizing
  K = 0 start (Hewer 1971).

Primal-only by design: the caller re-attaches gradients through the
implicit DARE adjoint (``ops/kalman.py::_implicit_dare_P``), so this kernel
never needs a backward pass.  Divergent lanes (unstable T on rejected
draws) produce inf/NaN in isolation; callers flag them via isfinite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_cycle_reduction import _gj_solve, _mm, _mmT

__all__ = ["pallas_dare_settle"]


def _dare_kernel(T_ref, RQR_ref, Z_ref, H_ref, P_ref, *,
                 n: int, k: int, lyap_iters: int, hewer_iters: int,
                 inner_iters: int):
    T = T_ref[...]                        # (n, n, BT)
    RQR = RQR_ref[...]
    Z = Z_ref[...]                        # (k, n, BT)
    H = H_ref[...]                        # (k, k, BT)
    bt = T.shape[-1]
    dtype = T.dtype
    eye_k = jnp.broadcast_to(jnp.eye(k, dtype=dtype)[:, :, None], (k, k, bt))

    def lyap(A0, Q0, iters):
        def body(_, carry):
            A, P = carry
            P = P + _mmT(_mm(A, P), A)
            A = _mm(A, A)
            return A, P

        _, P = jax.lax.fori_loop(0, iters, body, (A0, Q0))
        return P

    # K = 0 start: unconditional covariance of the stable transition
    P = lyap(T, RQR, lyap_iters)

    def hewer(_, P):
        PZt = _mmT(P, Z)                  # (n, k, BT)
        S = _mm(Z, PZt) + H               # (k, k, BT)
        Sinv, _mp, _ld = _gj_solve(S, eye_k, k, with_logdet=True)
        Kp = _mm(T, _mm(PZt, Sinv))       # (n, k, BT)
        A_cl = T - _mm(Kp, Z)
        Qc = RQR + _mmT(_mm(Kp, H), Kp)
        Qc = 0.5 * (Qc + jnp.swapaxes(Qc, 0, 1))
        P_new = lyap(A_cl, Qc, inner_iters)
        return 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))

    P = jax.lax.fori_loop(0, hewer_iters, hewer, P)
    P_ref[...] = P


def pallas_dare_settle(T, RQR, Z, H, tile: int = 128,
                       lyap_iters: int = 12, hewer_iters: int = 8,
                       inner_iters: int = 16, interpret: bool = False):
    """Batched predictive DARE fixed point: (B, n, n) -> (B, n, n).

    Batch-first inputs T/RQR (B,n,n), Z (B,k,n), H (B,k,k).  Fixed-length
    schedule (no data-dependent exits inside the kernel): ``lyap_iters``
    doublings cover 2^12 = 4096 periods; each of the ``hewer_iters``
    quadratic polishes runs a 2^16-period inner doubling.  Eight polishes
    reach float32 machine accuracy (3.7e-8 vs scipy solve_discrete_are on
    random dense pencils; four reach only ~1e-3).

    Measured note (SW-2007, batch 512, real TPU): this kernel LOSES to the
    vmapped-XLA adaptive Hewer settle (51.4 vs ~41 us/draw value+grad) —
    the settle is matmul-bound and XLA already batches those onto the MXU;
    the lane layout pays off only for sequential per-element ops (LU
    pivoting, Cholesky), which is why the cycle-reduction and filter-tail
    kernels win but this one does not.  Accuracy: the schedule is
    FIXED-length (Mosaic kernels cannot early-exit per lane), so the caller
    (``stats/statespace.py::build_batched_logpost(..., settle="pallas")``)
    verifies convergence OUTSIDE the kernel — one Riccati-step residual per
    lane against the dtype's noise floor — and rejects un-settled lanes as
    -inf, the same contract as the adaptive XLA settle (ops/kalman.py).
    Kept as an option and as the measured record of that finding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, n, _ = T.shape
    k = Z.shape[1]
    dtype = T.dtype
    pad = (-Bn) % tile
    Bp = Bn + pad

    def to_lanes(a):
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], dtype)], axis=0) if pad else a
        return jnp.moveaxis(a, 0, -1)

    T_l, RQR_l, Z_l, H_l = (to_lanes(m) for m in (T, RQR, Z, H))
    if pad:
        # identity measurement noise keeps padded lanes finite
        H_l = H_l.at[:, :, Bn:].add(jnp.eye(k, dtype=dtype)[:, :, None])

    n_tiles = Bp // tile
    kernel = functools.partial(_dare_kernel, n=n, k=k,
                               lyap_iters=lyap_iters,
                               hewer_iters=hewer_iters,
                               inner_iters=inner_iters)

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (tile,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    P = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), dtype),
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[spec(n, n), spec(n, n), spec(k, n), spec(k, k)],
            out_specs=spec(n, n)),
        interpret=interpret,
    )(T_l, RQR_l, Z_l, H_l)

    return jnp.moveaxis(P, -1, 0)[:Bn]
