"""Cyclostationary (periodic constant-gain) Kalman log-likelihood.

Mixed-frequency datasets (``prepare_mixed_frequency_data``, role parity with
``gEconpy/model/statespace.py:1432``) have a *periodic* missingness pattern —
e.g. a quarterly series inside a monthly panel is observed every third row.
The reference handles such data only through the exact per-step filter; here
the stationary-filter fast path (``ops/kalman.py::stationary_kalman_loglik``)
is generalized to periodic masks:

- Under a mask pattern repeating with period ``p``, the Riccati recursion
  converges to a *cycle* of predictive covariances ``P_0 .. P_{p-1}`` (the
  periodic DARE).  The filter with gains frozen at that cycle is exact — the
  covariance recursion simply stays on the cycle.
- The settle runs gradient-free; gradients re-attach through an **implicit
  periodic-DARE adjoint**: the phase-0 covariance is a fixed point of the
  one-cycle map ``F = f_{p-1} ∘ ... ∘ f_0``, so the backward pass is one
  Stein doubling solve with the cycle's closed-loop monodromy matrix plus a
  vjp of the p-step composite — cost independent of the settle length,
  exactly like the p=1 stationary filter.
- Convergence of the settle itself is quadratic: after a few masked Riccati
  steps, "cyclic Hewer" iterations solve the closed-loop *cyclic* Lyapunov
  equation  P_0 = A_cyc P_0 A_cycᵀ + G_cyc  exactly by doubling, where
  ``A_cyc`` is the product of per-phase closed-loop matrices and ``G_cyc``
  the noise accumulated over one cycle.

Everything is a pure jittable function of static shapes: the mask pattern
(p, k) is a build-time constant, per-phase matrices are stacked and indexed
with ``t mod p`` inside the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .lyapunov import _doubling
from .precision import highest_precision

__all__ = ["detect_mask_period", "cyclostationary_kalman_loglik"]

_LOG2PI = 1.8378770664093453


def detect_mask_period(mask: np.ndarray, max_period: int = 24) -> int | None:
    """Smallest period ``p <= max_period`` such that the (periods, k) bool
    mask is exactly ``mask[t] == pattern[t % p]``.  Returns None if the
    missingness is not periodic (caller should fall back to the sequential
    masked filter).  Host-side, static: the mask comes from the dataset.

    A candidate period must complete at least TWO full cycles
    (``p <= periods // 2``): any mask trivially "repeats" at periods longer
    than half the sample (the tail never contradicts the pattern), and
    routing e.g. a dataset with one isolated hole into a p-phase
    cyclostationary filter would be correct but wildly slower than the
    sequential masked filter the caller falls back to."""
    mask = np.asarray(mask, dtype=bool)
    periods = mask.shape[0]
    for p in range(1, min(max_period, periods // 2) + 1):
        pattern = mask[:p]
        reps = -(-periods // p)
        tiled = np.tile(pattern, (reps, 1))[:periods]
        if np.array_equal(tiled, mask):
            return p
    return None


def _phase_matrices(Z, H, pattern):
    """Per-phase effective design/measurement-noise matrices.

    Missing rows of Z are zeroed and H gets a unit diagonal there, so the
    innovation covariance stays SPD and missing rows contribute exactly zero
    to the log-likelihood (v=0, log det contribution 0) — the same masking
    trick as the sequential filter's ``_filter_step``.
    """
    m = pattern.astype(Z.dtype)                      # (p, k)
    Z_j = Z[None, :, :] * m[:, :, None]              # (p, k, n)
    H_j = H[None, :, :] * (m[:, :, None] * m[:, None, :]) \
        + jax.vmap(jnp.diag)(1.0 - m)                # (p, k, k)
    return m, Z_j, H_j


def _masked_dare_step(P, T, RQR, Z_j, H_j):
    """One predictive Riccati step under phase-j masking."""
    PZt = P @ Z_j.T
    S = Z_j @ PZt + H_j
    chol_S = jnp.linalg.cholesky(S)
    K = jax.scipy.linalg.cho_solve((chol_S, True), PZt.T).T   # P Zᵀ S⁻¹
    P_upd = P - K @ PZt.T
    P_next = T @ P_upd @ T.T + RQR
    return 0.5 * (P_next + P_next.T)


def _cycle_map(P0, T, RQR, Z_stack, H_stack):
    """F(P_0) = f_{p-1}(... f_0(P_0)) — one full cycle of masked steps."""
    p = Z_stack.shape[0]

    def body(j, P):
        return _masked_dare_step(P, T, RQR, Z_stack[j], H_stack[j])

    return jax.lax.fori_loop(0, p, body, P0)


def _cycle_closed_loop(P0, T, RQR, Z_stack, H_stack):
    """Monodromy A_cyc = A_{p-1}...A_0 and accumulated noise G_cyc of the
    closed-loop Joseph propagation  P_{j+1} = A_j P_j A_jᵀ + Q_j."""
    p = Z_stack.shape[0]
    n = T.shape[0]

    def body(j, carry):
        P, A_cyc, G_cyc = carry
        Z_j, H_j = Z_stack[j], H_stack[j]
        PZt = P @ Z_j.T
        S = Z_j @ PZt + H_j
        Kp = T @ jnp.linalg.solve(S, PZt.T).T         # predictive gain
        A_j = T - Kp @ Z_j
        Q_j = RQR + Kp @ H_j @ Kp.T
        A_cyc = A_j @ A_cyc
        G_cyc = A_j @ G_cyc @ A_j.T + Q_j
        P_next = A_j @ P @ A_j.T + Q_j
        return (0.5 * (P_next + P_next.T), A_cyc, G_cyc)

    eye = jnp.eye(n, dtype=T.dtype)
    zero = jnp.zeros((n, n), T.dtype)
    _, A_cyc, G_cyc = jax.lax.fori_loop(0, p, body, (P0, eye, zero))
    return A_cyc, 0.5 * (G_cyc + G_cyc.T)


@highest_precision
def _stein_cycle(A, G, iters: int = 40):
    """W = Σ_k (Aᵀ)^k G A^k by Smith doubling (adjoint of dP -> A dP Aᵀ)."""
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
        cond, body, (G, A, jnp.asarray(0), jnp.asarray(False)))
    return W


@jax.custom_vjp
def _implicit_cyclic_dare_P(T, RQR, Z_stack, H_stack, P_primal):
    """Identity on the converged phase-0 periodic-DARE solution; the VJP is
    the implicit fixed-point adjoint of the one-cycle map (the p=1 case
    reduces to ``ops/kalman.py::_implicit_dare_P``)."""
    return P_primal


def _icdare_fwd(T, RQR, Z_stack, H_stack, P):
    return P, (T, RQR, Z_stack, H_stack, P)


@highest_precision
def _icdare_bwd(res, P_bar):
    T, RQR, Z_stack, H_stack, P = res
    A_cyc, _ = _cycle_closed_loop(P, T, RQR, Z_stack, H_stack)
    # w = (I − F_Pᵀ)⁻¹ P̄ with F_P(dP) = A_cyc dP A_cycᵀ
    w = _stein_cycle(A_cyc, 0.5 * (P_bar + P_bar.T))
    # θ cotangents: vjp of ONE cycle at the fixed point, P held fixed
    _, vjp = jax.vjp(
        lambda t, rqr, zs, hs: _cycle_map(P, t, rqr, zs, hs),
        T, RQR, Z_stack, H_stack)
    T_bar, RQR_bar, Zs_bar, Hs_bar = vjp(w)
    return (T_bar, RQR_bar, Zs_bar, Hs_bar, jnp.zeros_like(P))


_implicit_cyclic_dare_P.defvjp(_icdare_fwd, _icdare_bwd)


@highest_precision
def cyclostationary_kalman_loglik(y, T, R, Q, Z, H, d=None, x0=None,
                                  mask_pattern=None, n_settle: int = 16):
    """Kalman log-likelihood under a periodic missingness pattern.

    Parameters
    ----------
    y
        (periods, k) data; missing entries may be NaN (they are ignored —
        the *pattern* decides what is observed).
    mask_pattern
        (p, k) boolean array: ``mask_pattern[t % p, i]`` is True when series
        ``i`` is observed at time t.  With p = 1 and an all-True pattern this
        is exactly the stationary filter.  Use :func:`detect_mask_period` on
        ``np.isfinite(data)`` to derive it host-side.
    n_settle
        Number of full mask cycles of gradient-free Riccati settling before
        the cyclic-Hewer polish.

    Gradient structure matches ``stationary_kalman_loglik``: settle is
    gradient-free, the fixed point re-attaches through the implicit
    periodic-DARE adjoint, and the frozen-gain scan is linear — backward
    cost does not scale with ``n_settle``.
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
    if d is None:
        d = jnp.zeros((k,), dtype)
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)
    if mask_pattern is None:
        mask_pattern = np.ones((1, k), dtype=bool)
    pattern = jnp.asarray(np.asarray(mask_pattern, dtype=bool))
    p = pattern.shape[0]
    RQR = R @ Q @ R.T

    m, Z_stack, H_stack = _phase_matrices(Z, H, pattern)

    # ---- gradient-free settle to the periodic fixed point (phase 0)
    Ts, RQRs, Zs_s, Hs_s = (jax.lax.stop_gradient(a)
                            for a in (T, RQR, Z_stack, H_stack))

    # start at the OPEN-LOOP unconditional phase-0 covariance (one-cycle
    # monodromy T^p with the noise accumulated over a cycle, solved exactly
    # by doubling) — the cyclic analog of the stationary settle's K = 0
    # start.  P_uncond >= P* so exact Riccati cycles decrease monotonically
    # and every derived gain is stabilizing (Hewer's theorem applies down
    # the whole chain); starting from an arbitrary PSD matrix (e.g. RQR)
    # can produce a DEstabilizing gain whose closed-loop Lyapunov solve
    # blows up even when T itself is stable (measured: rho(A_cyc) = 1.18
    # from rho(T) = 0.97).
    def ol_body(j, carry):
        A_ol, G_ol = carry
        return (Ts @ A_ol, Ts @ G_ol @ Ts.T + RQRs)

    A_ol, G_ol = jax.lax.fori_loop(
        0, p, ol_body,
        (jnp.eye(n, dtype=dtype), jnp.zeros((n, n), dtype)))
    P_try = _doubling(A_ol, 0.5 * (G_ol + G_ol.T), 1e-14, 40)
    # unstable-but-detectable T has no open-loop covariance (the doubling
    # diverges) yet the periodic DARE still has a stabilizing solution: fall
    # back to the RQR start there — the exact Riccati warmup cycles
    # stabilize it, and the Hewer fallback below keeps progress honest
    P_uncond = jnp.where(jnp.all(jnp.isfinite(P_try)),
                         0.5 * (P_try + P_try.T), RQRs)

    def settle_cycle(P, _):
        return _cycle_map(P, Ts, RQRs, Zs_s, Hs_s), None

    P0, _ = jax.lax.scan(settle_cycle, P_uncond, None,
                         length=max(n_settle, 1))

    # cyclic Hewer polish: with gains frozen at the current cycle, the
    # closed-loop covariance over one cycle is linear — solve it exactly by
    # doubling, then re-derive gains; quadratically convergent.
    def hewer(P):
        A_cyc, G_cyc = _cycle_closed_loop(P, Ts, RQRs, Zs_s, Hs_s)
        P_new = _doubling(A_cyc, G_cyc, 1e-14, 40)
        ok = jnp.all(jnp.isfinite(P_new))
        # a failed stage falls back to ONE exact Riccati cycle (same fixed
        # point, guaranteed progress) — keeping the previous iterate would
        # freeze P and read as a zero update, i.e. a FALSE convergence
        # signal to the adaptive stop below
        return jnp.where(ok, 0.5 * (P_new + P_new.T),
                         _cycle_map(P, Ts, RQRs, Zs_s, Hs_s))

    # ADAPTIVE stage count, mirroring ops/kalman.py's stationary settle:
    # with tiny innovation covariances (no measurement error) the
    # Newton/Kleinman quadratic basin shrinks like the smallest eigenvalue
    # of S and the iteration grinds linearly before the quadratic endgame —
    # a FIXED count is silently biased on ill-conditioned draws (the SW-2007
    # bug class; see tests/ops/test_cyclo_kalman.py::
    # test_cyclic_settle_unbiased_tiny_innovations).  Four unconditional
    # stages, then continuation until the one-cycle-map update hits the
    # dtype's noise floor (a few eps of |P|, or a plateau while already
    # <= sqrt(eps) |P|); draws whose settle never converges — or whose
    # iterates went non-finite — are rejected as -inf below.
    for _ in range(4):
        P0 = hewer(P0)

    eps = float(np.finfo(np.dtype(dtype)).eps)
    rtol_hard = 5.0 * eps
    rtol_soft = float(np.sqrt(eps))
    extra_cap = 12

    def cont_cond(state):
        _, _, it, _, stop = state
        return (~stop) & (it < extra_cap)

    def cont_body(state):
        P, prev_delta, it, _, _ = state
        P_new = hewer(P)
        delta = jnp.max(jnp.abs(P_new - P))
        scale = jnp.max(jnp.abs(P_new))
        plateau = (delta >= 0.5 * prev_delta) & (delta <= rtol_soft * scale)
        finite = jnp.isfinite(delta)
        settled = finite & ((delta <= rtol_hard * scale) | plateau)
        return (P_new, delta, it + 1, settled, settled | ~finite)

    P0, _, _, settled, _ = jax.lax.while_loop(
        cont_cond, cont_body,
        (P0, jnp.asarray(jnp.inf, dtype), jnp.asarray(0),
         jnp.asarray(False), jnp.asarray(False)))
    P0 = _implicit_cyclic_dare_P(T, RQR, Z_stack, H_stack, P0)

    # ---- differentiable per-phase frozen-gain quantities from P0
    def phase_quants(P, j):
        Z_j, H_j, m_j = Z_stack[j], H_stack[j], m[j]
        PZt = P @ Z_j.T
        S = Z_j @ PZt + H_j
        chol_S = jnp.linalg.cholesky(S)
        K = jax.scipy.linalg.cho_solve((chol_S, True), PZt.T).T
        Sinv = jax.scipy.linalg.cho_solve((chol_S, True),
                                          jnp.eye(k, dtype=dtype))
        TK = T @ K
        M_j = T - TK @ Z_j
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_S)))
        const = -0.5 * (jnp.sum(m_j) * _LOG2PI + logdet)
        P_next = _masked_dare_step(P, T, RQR, Z_j, H_j)
        return P_next, (M_j, TK, Sinv, const)

    P_j = P0
    Ms, TKs, Sinvs, consts = [], [], [], []
    for j in range(p):        # p is a small static build-time constant
        P_j, (M_j, TK_j, Sinv_j, const_j) = phase_quants(P_j, j)
        Ms.append(M_j)
        TKs.append(TK_j)
        Sinvs.append(Sinv_j)
        consts.append(const_j)
    Ms = jnp.stack(Ms)
    TKs = jnp.stack(TKs)
    Sinvs = jnp.stack(Sinvs)
    consts = jnp.stack(consts)

    # ---- frozen-gain scan with phase-indexed constants
    phase = jnp.arange(periods) % p
    y_eff = jnp.where(pattern[phase], y, 0.0).astype(dtype)

    def fast_step(x_pred, inputs):
        y_t, j = inputs
        Z_j = Z_stack[j]
        d_j = d * m[j]
        v = y_t - Z_j @ x_pred - d_j
        w = Sinvs[j] @ v
        ll_t = consts[j] - 0.5 * (v @ w)
        x_next = Ms[j] @ x_pred + TKs[j] @ (y_t - d_j)
        return x_next, ll_t

    _, ll_t = jax.lax.scan(fast_step, jnp.asarray(x0, dtype), (y_eff, phase))
    ll = jnp.sum(ll_t)
    # an un-settled periodic fixed point would yield a silently biased
    # likelihood (and the implicit adjoint would be evaluated off the fixed
    # point, biasing gradients) — reject the draw instead
    return jnp.where(settled & jnp.isfinite(ll), ll,
                     jnp.asarray(-jnp.inf, ll.dtype))
