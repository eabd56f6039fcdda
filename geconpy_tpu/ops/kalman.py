"""Kalman filter / smoother as fused lax.scan kernels.

Replaces the reference's pytensor-scan filter (entered via pymc_extras from
``gEconpy/model/statespace.py:1139``) with a TPU-first design:

- one fused predict+update step per time point inside ``lax.scan`` — XLA
  keeps the whole recursion on-chip; states are small so the step is
  VPU/MXU-bound with zero host sync;
- missing observations handled by masking (rows of Z/H neutralized, loglik
  normalizing constant counts only observed entries), so ragged data keeps
  static shapes;
- Cholesky-based innovation solve (PSD-stable) and Joseph-form covariance
  update;
- everything is vmappable over parameter draws — the estimation hot loop
  vmaps solve+filter over thousands of chains.

State space:
    x_t = T x_{t-1} + R eps_t,        eps ~ N(0, Q)
    y_t = Z x_t + d + eta_t,          eta ~ N(0, H)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .precision import highest_precision
from .tolerances import success_tol

# Hewer stage schedule for the stationary settle: _N_HEWER unconditional
# stages, then adaptive extra stages (capped by the caller's ``n_settle``
# total) until successive iterates agree to _HEWER_RTOL_EPS machine epsilons
# (the dtype's noise floor).  Hewer's
# iteration is globally convergent and asymptotically quadratic (Hewer
# 1971), but with tiny innovation covariances (no measurement error) the
# quadratic basin shrinks like the smallest eigenvalue of S = Z P Zᵀ + H
# and the middle stages contract only ~x0.2/stage — measured on SW-2007
# (7 observables, no ME), 4 stages leave a +10..+460 log-likelihood bias
# and ~8-10 reach the fixed point, so a fixed count of 4 is silently wrong
# and a fixed safe count wastes stages on well-conditioned models.  See
# tests/ops/test_stationary_kalman.py::test_settle_unbiased_tiny_innovations.
_N_HEWER = 4
_HEWER_RTOL_EPS = 5.0

__all__ = ["KalmanFilterResult", "KalmanSmootherResult", "kalman_filter",
           "kalman_smoother", "kalman_loglik", "steady_state_kalman_loglik",
           "steady_state_filter_parts", "stationary_kalman_loglik",
           "stationary_loglik_from_P", "disturbance_smoother",
           "DisturbanceSmootherResult"]

_LOG2PI = 1.8378770664093453


class KalmanFilterResult(NamedTuple):
    loglik: jax.Array                 # scalar total log-likelihood
    loglik_t: jax.Array               # (periods,) per-period contributions
    filtered_mean: jax.Array          # (periods, n) E[x_t | y_{1:t}]
    filtered_cov: jax.Array           # (periods, n, n)
    predicted_mean: jax.Array         # (periods, n) E[x_t | y_{1:t-1}]
    predicted_cov: jax.Array          # (periods, n, n)


class KalmanSmootherResult(NamedTuple):
    smoothed_mean: jax.Array          # (periods, n) E[x_t | y_{1:T}]
    smoothed_cov: jax.Array           # (periods, n, n)


def _filter_step(T, RQR, Z, d, H, carry, y_t):
    """One fused predict+update.  y_t may contain NaN (missing)."""
    x_prev, P_prev = carry

    # predict
    x_pred = T @ x_prev
    P_pred = T @ P_prev @ T.T + RQR

    # mask missing observations
    mask = jnp.isfinite(y_t)
    maskf = mask.astype(x_pred.dtype)
    y_eff = jnp.where(mask, y_t, 0.0)
    Z_eff = Z * maskf[:, None]
    d_eff = d * maskf

    v = y_eff - Z_eff @ x_pred - d_eff
    PZt = P_pred @ Z_eff.T
    F = Z_eff @ PZt + H * jnp.outer(maskf, maskf) \
        + jnp.diag(1.0 - maskf)  # unit variance on missing rows keeps F SPD
    chol_F = jnp.linalg.cholesky(F)
    # solve F w = v  and  F K' = (P Z')' via the Cholesky factor
    w = jax.scipy.linalg.cho_solve((chol_F, True), v)
    K = jax.scipy.linalg.cho_solve((chol_F, True), PZt.T).T  # (n, k)

    x_filt = x_pred + K @ v
    eye = jnp.eye(P_pred.shape[0], dtype=P_pred.dtype)
    IKZ = eye - K @ Z_eff
    H_eff = H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)
    P_filt = IKZ @ P_pred @ IKZ.T + K @ H_eff @ K.T  # Joseph form
    P_filt = 0.5 * (P_filt + P_filt.T)

    # log-likelihood: only observed components count; missing rows contribute
    # v=0 and a unit diagonal in F (log det contribution 0)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_F)))
    n_obs_t = jnp.sum(maskf)
    ll_t = -0.5 * (n_obs_t * _LOG2PI + logdet + v @ w)

    return (x_filt, P_filt), (ll_t, x_filt, P_filt, x_pred, P_pred)


@highest_precision
def kalman_filter(y, T, R, Q, Z, H, d=None, x0=None, P0=None
                  ) -> KalmanFilterResult:
    """Run the filter over ``y`` of shape (periods, k_obs); NaN = missing.

    ``x0``/``P0`` default to the zero vector / stationary covariance must be
    supplied by the caller (see ``solve_discrete_lyapunov``) — the statespace
    layer wires that in.
    """
    y = jnp.asarray(y)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    Q = jnp.asarray(Q, dtype=T.dtype)
    Z = jnp.asarray(Z, dtype=T.dtype)
    H = jnp.asarray(H, dtype=T.dtype)
    n = T.shape[0]
    k = Z.shape[0]
    if d is None:
        d = jnp.zeros((k,), T.dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), T.dtype)
    if P0 is None:
        from .lyapunov import solve_discrete_lyapunov

        P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)

    RQR = R @ Q @ R.T

    def step(carry, y_t):
        return _filter_step(T, RQR, Z, d, H, carry, y_t)

    (_, _), (ll_t, x_filt, P_filt, x_pred, P_pred) = jax.lax.scan(
        step, (jnp.asarray(x0, T.dtype), jnp.asarray(P0, T.dtype)), y)

    return KalmanFilterResult(
        loglik=jnp.sum(ll_t),
        loglik_t=ll_t,
        filtered_mean=x_filt,
        filtered_cov=P_filt,
        predicted_mean=x_pred,
        predicted_cov=P_pred,
    )


def kalman_loglik(y, T, R, Q, Z, H, d=None, x0=None, P0=None):
    """Log-likelihood only (the estimation hot path).  NaN-safe: a non-finite
    result is returned as -inf so batched samplers reject the draw."""
    ll = kalman_filter(y, T, R, Q, Z, H, d, x0, P0).loglik
    return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)


def _spd_inverse(S):
    """Inverse of a small SPD matrix by unrolled Gauss-Jordan (no pivoting —
    SPD diagonal pivots are safe).  Batched Cholesky + triangular solves are
    sequential-in-k on TPU; this is k static vectorized rank-1 updates, much
    faster under vmap at k ~ 7, and differentiable (pure ops)."""
    return _spd_inverse_logdet(S)[0]


def _spd_inverse_logdet(S):
    """(S⁻¹, log det S) in one unrolled Gauss-Jordan sweep: the elimination
    pivots are exactly the Cholesky pivots squared, so their log-sum is the
    log-determinant for free — no separate batched Cholesky (sequential on
    TPU) needed.  A non-PD S yields a NaN logdet, which the callers' -inf
    gating rejects, matching the Cholesky failure mode."""
    k = S.shape[-1]
    A = jnp.concatenate([S, jnp.eye(k, dtype=S.dtype)], axis=-1)  # (k, 2k)
    logdet = jnp.zeros((), S.dtype)
    for i in range(k):
        d = A[i, i]
        logdet = logdet + jnp.log(d)
        piv = A[i, :] / d
        A = A - A[:, i:i + 1] * piv[None, :]
        A = A.at[i].set(piv)
    return A[:, k:], logdet


def _gj_inverse(W):
    """Inverse of a small GENERAL matrix by unrolled partially-pivoted
    Gauss-Jordan elimination.  Same rationale as ``_spd_inverse`` (batched
    LU factorizations serialize per element on TPU; n static vectorized
    rank-1 updates win under vmap at n ~ 26), plus a per-step row pivot —
    the SDA settle's I + G_k H_k is nonsingular (eigenvalues >= 1 for PSD
    G, H) but not symmetric, so the SPD no-pivot sweep is not safe for it.
    A singular input yields inf/NaN that the callers' flags reject.

    No physical row swap: per batch element a dynamic row gather + scatter
    costs ~50 us each at batch 512 (measured), so the pivot row is selected
    with one-hot masked reductions and each step is ONE fused outer-product
    update — the same trick the Pallas kernels use for Mosaic, paying off
    under plain vmap too.  Rows are consumed in pivot order, so the final
    left block is a permutation matrix L and the inverse is Lᵀ @ R."""
    n = W.shape[-1]
    dtype = W.dtype
    A = jnp.concatenate([W, jnp.eye(n, dtype=dtype)], axis=-1)  # (n, 2n)
    used = jnp.zeros((n,), bool)
    for i in range(n):
        score = jnp.where(used, -jnp.ones((n,), dtype), jnp.abs(A[:, i]))
        onehot = jnp.where(jnp.arange(n) == jnp.argmax(score),
                           jnp.ones((n,), dtype), jnp.zeros((n,), dtype))
        pivrow = (onehot[:, None] * A).sum(axis=0)
        pivrow = pivrow / pivrow[i]
        # rows r != p: A[r] -= A[r, i] * pivrow  (pivrow[i] == 1 zeroes the
        # column); row p: becomes pivrow exactly
        A = A - (A[:, i] - onehot)[:, None] * pivrow[None, :]
        used = used | (onehot > 0.5)
    L, R = A[:, :n], A[:, n:]
    return L.T @ R


def _dare_step(P, T, RQR, Z, H):
    """One predictive-form Riccati step:
    P⁺ = T P Tᵀ − T P Zᵀ S⁻¹ Z P Tᵀ + RQRᵀ with S = Z P Zᵀ + H."""
    PZt = P @ Z.T
    S = Z @ PZt + H
    K = PZt @ _spd_inverse(S)                                 # P Zᵀ S⁻¹
    P_upd = P - K @ PZt.T
    P_next = T @ P_upd @ T.T + RQR
    return 0.5 * (P_next + P_next.T)


@highest_precision
def dare_residual_settled(T, RQR, Z, H, P):
    """Convergence check for an externally-produced DARE iterate ``P``.

    True when one Riccati step moves ``P`` by no more than the dtype's soft
    noise floor (sqrt(eps) of |P| — the same threshold the adaptive settle
    accepts a plateau at), and the step stayed finite.  Used to gate the
    fixed-length Pallas settle (``ops/pallas_dare.py``), whose Mosaic kernel
    cannot early-exit per lane: un-settled lanes must be rejected as -inf,
    never returned silently biased.
    """
    import numpy as np

    P1 = _dare_step(P, T, RQR, Z, H)
    delta = jnp.max(jnp.abs(P1 - P))
    scale = jnp.max(jnp.abs(P))
    rtol = float(np.sqrt(np.finfo(np.dtype(P.dtype)).eps))
    return jnp.isfinite(delta) & (delta <= rtol * scale)


@highest_precision
def _sda_settle(T, RQR, Z, H, P_open=None, maxiter: int = 28):
    """DARE settle by the structure-preserving doubling algorithm (SDA-I,
    Chu–Fan–Lin 2004) on a SHIFTED equation that stays well-posed at H = 0.
    Returns ``(P, certified)``; primal-only (callers re-attach gradients
    through ``_implicit_dare_P``).

    Plain SDA needs G₀ = Zᵀ H⁻¹ Z — undefined exactly on the estimation
    hot path (no measurement error).  Substituting P = RQR + Y and
    completing the square (the standard cross-term reduction; pinned
    against a brute-force Riccati oracle in
    tests/ops/test_stationary_kalman.py) gives an equivalent DARE in Y

        Y = Â Y Âᵀ − Â Y Zᵀ (H̃ + Z Y Zᵀ)⁻¹ Z Y Âᵀ + Q̃

    with  H̃ = H + Z·RQR·Zᵀ  (PD whenever the shocks reach every
    observable within one period — e.g. SW-2007, 7 shocks / 7 obs),
    Â = T (I − RQR Zᵀ H̃⁻¹ Z)  and  Q̃ = Â·RQR·Tᵀ (symmetric).  The
    doubling iterates REPRESENT the 2^k-step Riccati flow as a linear
    fractional transform,  Φ^{2^k}(Y₀) = H_k + A_kᵀ Y₀ (I + G_k Y₀)⁻¹ A_k,
    so one loop of ~8 matmuls + one pivoted Gauss-Jordan inverse per
    iteration replaces the Hewer schedule's Lyapunov doubling per Newton
    stage.

    MEASURED OUTCOME (why this is an option, not the default): on SW-2007
    at batch 512 (n=26, k=7, TPU f32) the SDA settle runs ~8 us/draw
    SLOWER than the Hewer schedule (98 vs 90 us/draw including the shared
    per-draw solve) despite ~2x fewer loop trips.  The per-iteration
    (I + G_k H_k)⁻¹ is an n-step-sequential elimination of launch-bound
    fused ops, while Hewer's per-stage inverse is only k x k and its n x n
    work is plain matmuls — at k << n the elimination depth dominates
    exactly the budget doubling was supposed to save.  Kept as a
    documented, certificate-guarded alternative (same spirit as
    ``ops/pallas_dare.py``): it is the right tool where k ~ n or on
    hardware with cheap batched triangular solves.

    The returned P is the transform APPLIED AT Y₀ = P_open − RQR, i.e. the
    exact 2^{maxiter}-step Riccati iterate from the open-loop unconditional
    covariance — the same start the sequential filter and the Hewer settle
    use.  This matters: with H = 0 the DARE can have several PSD fixed
    points (measured on random exactly-observed systems), and the
    from-the-unconditional-covariance limit is the one the time-varying
    filter approaches, so "converged from P_open" is the only acceptable
    answer; a from-zero doubling can certify a DIFFERENT fixed point.

    Convergence is never assumed: the result carries a certificate from
    ``dare_residual_settled`` (one exact Riccati step at the dtype's noise
    floor — the same acceptance the adaptive Hewer settle uses), and
    callers either fall back to the Hewer schedule or reject the draw as
    -inf when it fails.  Reference role: the steady-state Kalman gain the
    reference's pytensor scan filter approaches implicitly
    (gEconpy/model/statespace.py:815 initializes at the unconditional
    covariance)."""
    import numpy as np

    from .lyapunov import _doubling

    dtype = T.dtype
    eps = float(np.finfo(np.dtype(dtype)).eps)
    n = T.shape[0]
    eye = jnp.eye(n, dtype=dtype)

    if P_open is None:
        P_open = _doubling(T, RQR, 1e-14, 40)
    Y0 = P_open - RQR
    Y0 = 0.5 * (Y0 + Y0.T)
    y0n = jnp.max(jnp.abs(Y0))

    Ht = H + Z @ RQR @ Z.T
    Hti = _spd_inverse(Ht)
    ZtHti = Z.T @ Hti
    Ahat = T @ (eye - RQR @ (ZtHti @ Z))
    Qt = Ahat @ RQR @ T.T
    A0 = Ahat.T
    G0 = ZtHti @ Z
    H0 = 0.5 * (Qt + Qt.T)

    rtol = _HEWER_RTOL_EPS * eps
    floor_scale = jnp.max(jnp.abs(RQR))

    def cond(state):
        _, _, _, it, done = state
        return (~done) & (it < maxiter)

    def body(state):
        A, G, Hk, it, _ = state
        Wi = _gj_inverse(eye + G @ Hk)
        WA = Wi @ A
        A1 = A @ WA
        WiG = Wi @ G                    # symmetric: (I+GH)⁻¹G = G(I+HG)⁻¹
        G1 = G + A @ WiG @ A.T
        H1 = Hk + (A.T @ Hk) @ WA
        G1 = 0.5 * (G1 + G1.T)
        H1 = 0.5 * (H1 + H1.T)
        delta = jnp.max(jnp.abs(H1 - Hk))
        scale = jnp.maximum(jnp.max(jnp.abs(H1)), floor_scale)
        # stop when the from-zero trajectory has stabilized AND the
        # start-dependent correction A_kᵀ Y₀ (I+G_k Y₀)⁻¹ A_k is below the
        # same floor (‖(I+GY₀)⁻¹‖ ≈ 1 for PSD G, Y₀): otherwise a from-zero
        # plateau could stop the loop while the from-P_open iterate is
        # still moving
        a1n = jnp.max(jnp.abs(A1))
        finite = jnp.isfinite(delta) & jnp.isfinite(a1n)
        done = ((delta <= rtol * scale)
                & (a1n * a1n * (n * y0n) <= rtol * scale)) | ~finite
        return (A1, G1, H1, it + 1, done)

    A, G, Hk, _, _ = jax.lax.while_loop(
        cond, body, (A0, G0, H0, jnp.asarray(0), jnp.asarray(False)))
    # apply the 2^k-step transform at the unconditional-covariance start
    corr = (A.T @ (Y0 @ _gj_inverse(eye + G @ Y0))) @ A
    P = RQR + Hk + 0.5 * (corr + corr.T)
    P = 0.5 * (P + P.T)
    certified = dare_residual_settled(T, RQR, Z, H, P)
    return P, certified


@highest_precision
def _stein_adjoint(A_cl, G, iters: int = 30):
    """W = Σ_k (A_clᵀ)^k G (A_cl)^k by Smith doubling with early exit —
    the adjoint of the DARE's Fréchet derivative dP⁺ = A_cl dP A_clᵀ."""
    import numpy as np

    eps = float(np.finfo(np.dtype(G.dtype)).eps)

    def cond(carry):
        _, _, it, done = carry
        return (~done) & (it < iters)

    def body(carry):
        W, A_k, it, _ = carry
        delta = A_k.T @ W @ A_k
        W_new = W + delta
        small = jnp.max(jnp.abs(delta)) <= eps * jnp.max(jnp.abs(W_new))
        done = small | ~jnp.isfinite(jnp.max(jnp.abs(delta)))
        return (W_new, A_k @ A_k, it + 1, done)

    W, _, _, _ = jax.lax.while_loop(
        cond, body, (G, A_cl, jnp.asarray(0), jnp.asarray(False)))
    return W


@jax.custom_vjp
def _implicit_dare_P(T, RQR, Z, H, P_primal):
    """Identity on the converged DARE solution whose VJP is the implicit
    fixed-point adjoint: the primal Riccati iterations are gradient-free
    (stop_gradient), so the backward pass costs one Stein doubling solve +
    one vjp of a single Riccati step instead of unrolling n_settle steps —
    the same trick the policy solve uses (``ops/static_reduction.py``)."""
    return P_primal


def _idare_fwd(T, RQR, Z, H, P):
    return P, (T, RQR, Z, H, P)


@highest_precision
def _idare_bwd(res, P_bar):
    T, RQR, Z, H, P = res
    PZt = P @ Z.T
    S = Z @ PZt + H
    # unrolled GJ inverse, not jnp.linalg.solve: batched LU is sequential
    # per element on TPU and this runs per draw at batch >= 512
    Kp = T @ (PZt @ _spd_inverse(S))       # predictive gain T P Zᵀ S⁻¹
    A_cl = T - Kp @ Z
    # w = (I − f_Pᵀ)⁻¹ P_bar with f_P(dP) = A_cl dP A_clᵀ
    w = _stein_adjoint(A_cl, 0.5 * (P_bar + P_bar.T))
    # θ cotangents: vjp of one Riccati step at the fixed point, P held fixed
    _, vjp = jax.vjp(lambda t, rqr, z, h: _dare_step(P, t, rqr, z, h),
                     T, RQR, Z, H)
    T_bar, RQR_bar, Z_bar, H_bar = vjp(w)
    return (T_bar, RQR_bar, Z_bar, H_bar, jnp.zeros_like(P))


_implicit_dare_P.defvjp(_idare_fwd, _idare_bwd)


def _make_hewer_stage(Ts, RQRs, Zs, Hs):
    """One Hewer/Kleinman stage (exact closed-loop Lyapunov solve by Smith
    doubling) with the Riccati-step fallback on a blown-up inner solve."""
    from .lyapunov import _doubling

    def hewer_stage(P):
        PZt = P @ Zs.T
        S_h = Zs @ PZt + Hs
        Kp = Ts @ (PZt @ _spd_inverse(S_h))            # predictive gain
        A_cl = Ts - Kp @ Zs
        Qc = RQRs + Kp @ Hs @ Kp.T
        P_new = _doubling(A_cl, 0.5 * (Qc + Qc.T), 1e-14, 30)
        # a blown-up Lyapunov solve falls back to ONE exact Riccati step
        # (same fixed point, guaranteed progress): keeping the previous
        # iterate would freeze P, and the adaptive stop below would read
        # the zero update as convergence — a silently biased likelihood
        ok = jnp.all(jnp.isfinite(P_new))
        return jnp.where(ok, 0.5 * (P_new + P_new.T),
                         _dare_step(P, Ts, RQRs, Zs, Hs))

    return hewer_stage


@highest_precision
def _hewer_settle(Ts, RQRs, Zs, Hs, n_settle: int):
    """Hewer/Kleinman settle to the DARE fixed point (primal-only).

    K = 0 is stabilizing for the stable T this path gates on, and its
    closed-loop Lyapunov solution is exactly the unconditional covariance,
    so the schedule starts from one doubling Lyapunov solve.  Convergence is
    globally monotone and asymptotically quadratic (Hewer 1971) — but the
    quadratic basin scales like lambda_min(S), so the stage count is
    ADAPTIVE (see _N_HEWER above) rather than a fixed handful: an unrolled
    floor of _N_HEWER unconditional stages (a static handful — a lax.scan
    here spends more on its carry's dynamic-update-slices than on the math
    at the batch-512 estimation hot path), then adaptive continuation to
    the dtype's noise floor.  "Settled" means EITHER the update is a few
    machine epsilons of |P|, OR the updates have stopped contracting
    (plateau, ratio >= 1/2 of the previous) while already small
    (<= sqrt(eps) * |P|) — a plateau at a LARGE update is genuine
    non-convergence and the draw is rejected.  Under vmap this runs until
    the worst draw in the batch converges: well-conditioned batches pay a
    couple of extra stages, tiny-innovation tails up to the cap."""
    import numpy as np

    from .lyapunov import _doubling

    dtype = Ts.dtype
    P = _doubling(Ts, RQRs, 1e-14, 40)
    hewer_stage = _make_hewer_stage(Ts, RQRs, Zs, Hs)

    for _ in range(_N_HEWER):
        P = hewer_stage(P)

    eps = float(np.finfo(np.dtype(dtype)).eps)
    rtol_hard = _HEWER_RTOL_EPS * eps
    rtol_soft = float(np.sqrt(eps))
    # n_settle is the total stage cap (floor stages included); always allow
    # at least one adaptive stage so `settled` is a measured fact
    extra_cap = max(1, int(n_settle) - _N_HEWER)

    def cond(state):
        _, _, it, _, stop = state
        return (~stop) & (it < extra_cap)

    def body(state):
        P, prev_delta, it, _, _ = state
        P_new = hewer_stage(P)
        delta = jnp.max(jnp.abs(P_new - P))
        scale = jnp.max(jnp.abs(P_new))
        plateau = (delta >= 0.5 * prev_delta) & (delta <= rtol_soft * scale)
        finite = jnp.isfinite(delta)
        # a non-finite delta exits the loop but is NOT settled — the draw is
        # rejected as -inf (failure = flags, never NaN)
        settled = finite & ((delta <= rtol_hard * scale) | plateau)
        return (P_new, delta, it + 1, settled, settled | ~finite)

    P, _, _, settled, _ = jax.lax.while_loop(
        cond, body,
        (P, jnp.asarray(jnp.inf, dtype), jnp.asarray(0),
         jnp.asarray(False), jnp.asarray(False)))
    return P, settled


@highest_precision
def _auto_settle(Ts, RQRs, Zs, Hs, n_settle: int):
    """SDA fast path + Hewer continuation for draws its certificate rejects.

    The continuation lives in ONE ``while_loop`` whose done-flag starts at
    the SDA certificate, so a fully-certified batch pays zero extra stages
    under vmap (a vmapped while_loop runs until the worst lane is done).
    Uncertified draws rebuild from the open-loop unconditional covariance
    (shared with the SDA's start correction) — NEVER from the uncertified
    SDA iterate: a Hewer gain derived from a bad start can be DEstabilizing
    (see _N_HEWER notes), and the open-loop start is the schedule with the
    convergence guarantee."""
    import numpy as np

    from .lyapunov import _doubling

    dtype = Ts.dtype
    eps = float(np.finfo(np.dtype(dtype)).eps)
    rtol_hard = _HEWER_RTOL_EPS * eps
    rtol_soft = float(np.sqrt(eps))

    P_open = _doubling(Ts, RQRs, 1e-14, 40)
    P_sda, cert = _sda_settle(Ts, RQRs, Zs, Hs, P_open)
    hewer_stage = _make_hewer_stage(Ts, RQRs, Zs, Hs)
    cap = max(_N_HEWER + 1, int(n_settle))   # same total as the pure path

    def cond(state):
        _, _, it, _, stop = state
        return (~stop) & (it < cap)

    def body(state):
        P, prev_delta, it, _, _ = state
        P_new = hewer_stage(P)
        delta = jnp.max(jnp.abs(P_new - P))
        scale = jnp.max(jnp.abs(P_new))
        # same acceptance as the pure-Hewer schedule; stages up to the
        # _N_HEWER floor are unconditional (quoting measured deltas there
        # would let the shrinking-basin middle stages masquerade as a
        # plateau — see the _N_HEWER notes)
        can_stop = it >= _N_HEWER
        plateau = (delta >= 0.5 * prev_delta) & (delta <= rtol_soft * scale)
        finite = jnp.isfinite(delta)
        settled = can_stop & finite & ((delta <= rtol_hard * scale) | plateau)
        return (P_new, delta, it + 1, settled, settled | ~finite)

    P0 = jnp.where(cert, P_sda, P_open)
    P, _, _, settled, _ = jax.lax.while_loop(
        cond, body,
        (P0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0), cert, cert))
    return P, settled


@highest_precision
def stationary_kalman_loglik(y, T, R, Q, Z, H, d=None, x0=None,
                             n_settle: int = 32,
                             settle_method: str = "hewer"):
    """Stationary (constant-gain from t=0) Kalman log-likelihood.

    The predictive covariance is pinned at the DARE fixed point P∞, so the
    WHOLE filter is a linear constant-coefficient recursion — equivalent to
    the exact filter initialized at P0 = P∞ (the filter stays at the fixed
    point), and the standard "stationary Kalman filter" of the state-space
    literature.  TPU-first gradient structure:

    - the Riccati settle runs gradient-free (``stop_gradient``);
    - gradients re-attach at the fixed point through the implicit adjoint
      (one Stein doubling solve + one step-vjp), so backward cost does not
      scale with ``n_settle``;
    - the constant-gain scan is linear, so its autodiff transpose is one
      cheap backward matvec scan.

    ``settle_method`` picks the primal settle: ``"hewer"`` (default, fastest
    measured — see ``_sda_settle`` for why), ``"sda"`` (one SDA doubling
    loop, uncertified draws rejected), or ``"auto"`` (SDA + Hewer
    continuation for draws the certificate rejects).  ``n_settle`` caps the
    TOTAL number of Hewer
    stages: after the ``_N_HEWER`` unconditional stages, up to
    ``n_settle - _N_HEWER`` (at least one) extra adaptive stages run until
    successive iterates agree at the dtype's noise floor.  Draws whose
    settle has not converged within the cap — or whose iterates went
    non-finite — are rejected as -inf, never returned biased.

    Requires fully observed data (no NaN).  Role: the value+grad estimation
    hot path (NUTS); the reference's counterpart is the pytensor scan filter
    whose gradient unrolls every step.
    """
    y = jnp.asarray(y)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    dtype = T.dtype
    Q = jnp.asarray(Q, dtype)
    Z = jnp.asarray(Z, dtype)
    H = jnp.asarray(H, dtype)
    n = T.shape[0]
    k = Z.shape[0]
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    RQR = R @ Q @ R.T

    # primal-only settle to the DARE fixed point (gradients re-attach at the
    # fixed point through the implicit adjoint; un-settled draws -inf):
    #   "hewer" — the Hewer/Kleinman schedule (open-loop unconditional-
    #             covariance start, _N_HEWER unconditional stages, adaptive
    #             continuation to the dtype's noise floor) — the measured
    #             default at k << n (see _sda_settle's outcome note);
    #   "sda"   — SDA doubling alone, uncertified draws rejected;
    #   "auto"  — SDA + Hewer continuation only for draws the
    #             Riccati-residual certificate rejects.
    Ts, RQRs, Zs, Hs = (jax.lax.stop_gradient(m) for m in (T, RQR, Z, H))
    if settle_method == "auto":
        P, settled = _auto_settle(Ts, RQRs, Zs, Hs, n_settle)
    elif settle_method == "sda":
        P, settled = _sda_settle(Ts, RQRs, Zs, Hs)
    elif settle_method == "hewer":
        P, settled = _hewer_settle(Ts, RQRs, Zs, Hs, n_settle)
    else:
        raise ValueError(
            f"settle_method must be 'auto', 'sda' or 'hewer', "
            f"got {settle_method!r}")

    ll = stationary_loglik_from_P(y, T, RQR, Z, H, d, jnp.asarray(x0, dtype),
                                  P)
    # an un-settled fixed point would yield a silently biased likelihood —
    # reject the draw instead (visible as -inf, same convention as every
    # other numerical failure in the pipeline)
    return jnp.where(settled, ll, jnp.asarray(-jnp.inf, ll.dtype))


@highest_precision
def stationary_loglik_from_P(y, T, RQR, Z, H, d, x0, P):
    """Constant-gain log-likelihood given a (primal) DARE fixed point P.

    Shared by the per-draw XLA settle above and the batched Pallas settle
    (``ops/pallas_dare.py``): gradients re-attach here through the implicit
    DARE adjoint, so the settle that produced P never needs a backward pass.
    """
    dtype = T.dtype
    k = Z.shape[0]
    P = _implicit_dare_P(T, RQR, Z, H, P)

    PZt = P @ Z.T
    S = Z @ PZt + H
    # one dense k x k inverse up front: the scan then does a matvec per step
    # instead of a pair of triangular solves (sequential on TPU, and this
    # scan is the per-draw hot loop under vmap at batch >= 512); the same
    # Gauss-Jordan sweep's pivots give the log-determinant, replacing a
    # batched Cholesky
    Sinv, logdet = _spd_inverse_logdet(S)
    K = PZt @ Sinv
    TK = T @ K
    M = T - TK @ Z
    const = -0.5 * (k * _LOG2PI + logdet)

    def fast_step(x_pred, y_t):
        v = y_t - Z @ x_pred - d
        ll_t = const - 0.5 * (v @ (Sinv @ v))
        x_pred_next = M @ x_pred + TK @ (y_t - d)
        return x_pred_next, ll_t

    _, ll_t = jax.lax.scan(fast_step, jnp.asarray(x0, dtype), y)
    ll = jnp.sum(ll_t)
    return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)


@highest_precision
def steady_state_kalman_loglik(y, T, R, Q, Z, H, d=None, x0=None, P0=None,
                               n_settle: int = 48):
    """Constant-gain (steady-state) Kalman log-likelihood.

    For a stationary filter the covariance recursion converges geometrically;
    after ``n_settle`` exact steps the gain K, innovation factor chol(F) and
    log-det are frozen and the remaining periods reduce to

        x_pred' = (T - T K Z) x_pred + T K (y - d)

    — one n x n matvec per step instead of three n x n matmuls and a
    Cholesky.  This is the standard DSGE-estimation fast path; the error
    decays geometrically in ``n_settle``.  Requires fully observed data (no
    NaN) — callers must fall back to :func:`kalman_filter` otherwise.
    """
    y = jnp.asarray(y)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    dtype = T.dtype
    Q = jnp.asarray(Q, dtype)
    Z = jnp.asarray(Z, dtype)
    H = jnp.asarray(H, dtype)
    n = T.shape[0]
    k = Z.shape[0]
    periods = y.shape[0]
    n_settle = min(n_settle, periods)
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    if P0 is None:
        from .lyapunov import solve_discrete_lyapunov

        P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    RQR = R @ Q @ R.T

    # ---- phase 1: exact steps while P settles
    def step(carry, y_t):
        (x_filt, P_filt), (ll_t, *_rest) = _filter_step(
            T, RQR, Z, d, H, carry, y_t)
        return (x_filt, P_filt), ll_t

    (x_filt, P_filt), ll_head = jax.lax.scan(
        step, (jnp.asarray(x0, dtype), jnp.asarray(P0, dtype)), y[:n_settle])

    if n_settle == periods:
        ll = jnp.sum(ll_head)
        return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)

    # ---- freeze the gain at the settled covariance
    P_pred = T @ P_filt @ T.T + RQR
    F = Z @ P_pred @ Z.T + H
    chol_F = jnp.linalg.cholesky(F)
    K = jax.scipy.linalg.cho_solve((chol_F, True), (P_pred @ Z.T).T).T
    Finv = jax.scipy.linalg.cho_solve((chol_F, True), jnp.eye(k, dtype=dtype))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_F)))
    const = -0.5 * (k * _LOG2PI + logdet)
    M = T - (T @ K) @ Z          # x_pred recursion matrix
    TK = T @ K

    def fast_step(x_pred, y_t):
        v = y_t - Z @ x_pred - d
        ll_t = const - 0.5 * (v @ (Finv @ v))
        x_pred_next = M @ x_pred + TK @ (y_t - d)
        return x_pred_next, ll_t

    x_pred0 = T @ x_filt
    _, ll_tail = jax.lax.scan(fast_step, x_pred0, y[n_settle:])
    ll = jnp.sum(ll_head) + jnp.sum(ll_tail)
    return jnp.where(jnp.isfinite(ll), ll, -jnp.inf)


@highest_precision
def steady_state_filter_parts(y_head, T, R, Q, Z, H, d=None, x0=None,
                              P0=None):
    """Settle phase + frozen-gain quantities for the Pallas tail kernel.

    Runs the exact filter over ``y_head`` and returns
    (ll_head, x_pred0, M, TK, Finv, const) — everything the fused
    constant-gain tail (:func:`geconpy_tpu.ops.pallas_filter
    .pallas_filter_tail`) needs per draw.
    """
    y_head = jnp.asarray(y_head)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    dtype = T.dtype
    Q = jnp.asarray(Q, dtype)
    Z = jnp.asarray(Z, dtype)
    H = jnp.asarray(H, dtype)
    n = T.shape[0]
    k = Z.shape[0]
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    if P0 is None:
        from .lyapunov import solve_discrete_lyapunov

        P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)
    RQR = R @ Q @ R.T

    def step(carry, y_t):
        (x_filt, P_filt), (ll_t, *_rest) = _filter_step(
            T, RQR, Z, d, H, carry, y_t)
        return (x_filt, P_filt), ll_t

    (x_filt, P_filt), ll_head = jax.lax.scan(
        step, (jnp.asarray(x0, dtype), jnp.asarray(P0, dtype)), y_head)

    P_pred = T @ P_filt @ T.T + RQR
    F = Z @ P_pred @ Z.T + H
    chol_F = jnp.linalg.cholesky(F)
    K = jax.scipy.linalg.cho_solve((chol_F, True), (P_pred @ Z.T).T).T
    Finv = jax.scipy.linalg.cho_solve((chol_F, True), jnp.eye(k, dtype=dtype))
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_F)))
    const = -0.5 * (k * _LOG2PI + logdet)
    M = T - (T @ K) @ Z
    TK = T @ K
    return jnp.sum(ll_head), T @ x_filt, M, TK, Finv, const


class DisturbanceSmootherResult(NamedTuple):
    shocks: jax.Array        # (periods, n_shocks) smoothed structural shocks
    obs_noise: jax.Array     # (periods, k_obs) smoothed measurement errors
    smoothed_mean: jax.Array  # (periods, n) E[x_t | y_{1:T}]


@highest_precision
def disturbance_smoother(y, T, R, Q, Z, H, d=None, x0=None, P0=None
                         ) -> DisturbanceSmootherResult:
    """Durbin-Koopman disturbance smoother (one forward filter + one
    backward ``lax.scan``).

    Returns smoothed structural shocks ``e_t`` and measurement errors
    ``u_t`` satisfying the exact reconstruction identities

        x_t^s = T x_{t-1}^s + R e_t^s        (t >= 1)
        y_t   = Z x_t^s + d + u_t^s          (observed entries)

    which is what makes exact historical shock decompositions possible
    (``stats/posterior.py::historical_shock_decomposition``).  Missing
    observations (NaN) are masked exactly as in :func:`kalman_filter`.
    Beyond reference parity: gEconpy has no disturbance smoother.
    """
    y = jnp.asarray(y)
    T = jnp.asarray(T)
    R = jnp.asarray(R)
    dtype = T.dtype
    Q = jnp.asarray(Q, dtype)
    Z = jnp.asarray(Z, dtype)
    H = jnp.asarray(H, dtype)
    n = T.shape[0]
    k = Z.shape[0]
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    if P0 is None:
        from .lyapunov import solve_discrete_lyapunov

        P0 = solve_discrete_lyapunov(T, R @ Q @ R.T)

    res = kalman_filter(y, T, R, Q, Z, H, d, x0, P0)

    def backward(r, inputs):
        y_t, x_pred, P_pred = inputs
        mask = jnp.isfinite(y_t)
        maskf = mask.astype(dtype)
        y_eff = jnp.where(mask, y_t, 0.0)
        Z_eff = Z * maskf[:, None]
        d_eff = d * maskf
        H_eff = H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)

        v = y_eff - Z_eff @ x_pred - d_eff
        F = Z_eff @ P_pred @ Z_eff.T + H_eff
        Finv = _spd_inverse(F)
        Fv = Finv @ v
        K_pred = T @ P_pred @ Z_eff.T @ Finv           # predictive gain
        L = T - K_pred @ Z_eff
        # r_{t-1} = Z' F^-1 v_t + L' r_t (DK 4.38); in the convention
        # x_t = T x_{t-1} + R e_t the shock e_t corresponds to DK's
        # eta_{t-1}, so e_t^s = Q R' r_{t-1}, while the measurement error
        # uses the future carry r_t (DK 4.69)
        r_prev = Z_eff.T @ Fv + L.T @ r
        e_t = Q @ R.T @ r_prev
        u_t = H_eff @ (Fv - K_pred.T @ r) * maskf
        x_s = x_pred + P_pred @ r_prev
        return r_prev, (e_t, u_t, x_s)

    r_end = jnp.zeros((n,), dtype)
    _, (eps, obs_noise, x_smooth) = jax.lax.scan(
        backward, r_end,
        (y, res.predicted_mean, res.predicted_cov), reverse=True)
    return DisturbanceSmootherResult(eps, obs_noise, x_smooth)


@highest_precision
def kalman_smoother(y, T, R, Q, Z, H, d=None, x0=None, P0=None
                    ) -> KalmanSmootherResult:
    """Rauch-Tung-Striebel smoother (backward lax.scan over filter output)."""
    T = jnp.asarray(T)
    res = kalman_filter(y, T, R, Q, Z, H, d, x0, P0)

    def backward(carry, inputs):
        x_next_smooth, P_next_smooth = carry
        x_filt, P_filt, x_pred_next, P_pred_next = inputs
        # J = P_filt Tᵀ P_pred_next⁺.  P_pred can be rank-deficient (fewer
        # shocks than states), so use a regularized symmetric solve.  The
        # ridge must sit above machine epsilon for the running dtype or the
        # float32 solve blows up on the deficient subspace.
        n_ = P_pred_next.shape[0]
        rel = success_tol(P_pred_next.dtype, base=1e-9, eps_multiple=100.0)
        eps = rel * (jnp.trace(P_pred_next) / n_ + 1e-30)
        P_reg = P_pred_next + eps * jnp.eye(n_, dtype=P_pred_next.dtype)
        J = jnp.linalg.solve(P_reg.T, (P_filt @ T.T).T).T
        x_s = x_filt + J @ (x_next_smooth - x_pred_next)
        P_s = P_filt + J @ (P_next_smooth - P_pred_next) @ J.T
        P_s = 0.5 * (P_s + P_s.T)
        return (x_s, P_s), (x_s, P_s)

    # inputs at time t use the prediction for t+1
    x_filt, P_filt = res.filtered_mean, res.filtered_cov
    x_pred_next = res.predicted_mean[1:]
    P_pred_next = res.predicted_cov[1:]
    inputs = (x_filt[:-1], P_filt[:-1], x_pred_next, P_pred_next)

    init = (x_filt[-1], P_filt[-1])
    (_, _), (xs_rev, Ps_rev) = jax.lax.scan(backward, init, inputs, reverse=True)

    smoothed_mean = jnp.concatenate([xs_rev, x_filt[-1][None]], axis=0)
    smoothed_cov = jnp.concatenate([Ps_rev, P_filt[-1][None]], axis=0)
    return KalmanSmootherResult(smoothed_mean, smoothed_cov)
