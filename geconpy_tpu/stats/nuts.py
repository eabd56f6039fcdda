"""Device-side No-U-Turn Sampler.

Replaces the reference's PyMC/NUTS dependency (``pm.sample`` over the
statespace logp, one process per chain) with a JAX-native NUTS whose kernel
is one jittable function — so **chains are vmapped**: thousands of chains run
batched on a single chip, and the parallel layer shard_maps chain blocks
across a mesh (SURVEY.md §2.9's TPU-native chain parallelism).

Implementation notes (written from the published algorithms):

- Hoffman & Gelman (2014) NUTS with multinomial (progressive) state sampling
  along the trajectory.
- Iterative tree building with a static ``max_depth``: one ``fori_loop`` per
  doubling, U-turn checks for every completed power-of-two-aligned subtree
  via a checkpoint buffer — slot m holds the state that opened the currently
  active subtree of size 2^m, so checks need O(max_depth) memory and no
  recursion (XLA-compatible control flow).
- Dual-averaging step-size adaptation (Nesterov) targeting 0.8 acceptance,
  Stan-style windowed diagonal mass-matrix estimation (Welford).
- Divergences = energy error > 1000; non-finite log posterior is handled by
  rejection, so flag-gated -inf draws from the DSGE logpost are safe.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NUTSResult", "sample_nuts", "nuts_kernel", "WindowedAdaptation"]

_MAX_DELTA_ENERGY = 1000.0


class _TreeState(NamedTuple):
    # current proposal
    q_prop: jax.Array
    logp_prop: jax.Array
    grad_prop: jax.Array
    # trajectory endpoints (left = backward in time, right = forward)
    q_left: jax.Array
    p_left: jax.Array
    grad_left: jax.Array
    logp_left: jax.Array
    q_right: jax.Array
    p_right: jax.Array
    grad_right: jax.Array
    logp_right: jax.Array
    # multinomial weight accumulator and flags
    log_weight: jax.Array
    sum_accept_prob: jax.Array
    n_leapfrog: jax.Array
    turning: jax.Array
    diverging: jax.Array


def _apply_inv_mass(inv_mass, p):
    """M⁻¹ p for a diagonal (1-D) or dense (2-D) metric — the rank is a
    trace-time constant, so both cases compile to straight-line code."""
    if inv_mass.ndim == 2:
        return inv_mass @ p
    return inv_mass * p


def _leapfrog(grad_fn, q, p, grad, eps, inv_mass):
    p_half = p + 0.5 * eps * grad
    q_new = q + eps * _apply_inv_mass(inv_mass, p_half)
    logp_new, grad_new = grad_fn(q_new)
    p_new = p_half + 0.5 * eps * grad_new
    return q_new, p_new, logp_new, grad_new


def _kinetic(p, inv_mass):
    return 0.5 * jnp.dot(p, _apply_inv_mass(inv_mass, p))


def _is_uturn(q_minus, q_plus, p_minus, p_plus, inv_mass):
    """Generalized U-turn criterion.

    Betancourt's criterion is ``p♯ · rho < 0`` with ``p♯ = M⁻¹ p`` and
    ``rho`` the trajectory's momentum sum; the leapfrog identity
    ``rho = M (q⁺ - q⁻) / eps`` makes it ``dot(dq, p) < 0`` — METRIC-FREE
    (the M⁻¹ on one side cancels the M on the other).  Using
    ``dot(dq, M⁻¹ p)`` instead is still a valid (symmetric) stopping rule,
    but in whitened coordinates it inserts a spurious LᵀL weighting that
    fires U-turns after a handful of steps regardless of how good the
    metric is — measured on a 12-dim 0.99-equicorrelated Gaussian it
    capped every trajectory at ~3 leapfrogs and cost ~4x the attainable
    effective sample size.  ``inv_mass`` is kept in the signature for the
    checkpoint-buffer call sites' shape discipline only."""
    del inv_mass
    dq = q_plus - q_minus
    return (jnp.dot(dq, p_minus) < 0) | (jnp.dot(dq, p_plus) < 0)


def _select(pred, a, b):
    """Masked pytree select: pred ? a : b.

    Used instead of ``lax.cond`` throughout the kernel: chains are always
    vmapped (where cond lowers to a both-branches select anyway), and
    branch-free selects sidestep shard_map's branch variance-type
    reconciliation under pooled cross-chain adaptation."""
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def nuts_kernel(logp_fn: Callable, q, logp, grad, key, step_size, inv_mass,
                max_depth: int = 8, axis_name: str | None = None,
                logp_grad_fn: Callable | None = None):
    """One NUTS transition.  Returns (q', logp', grad', info dict).

    ``axis_name``: when running inside ``shard_map`` with pooled
    (device-invariant) adaptation state, pass the mesh axis so freshly
    created literals and the shared step size/mass matrix are cast to
    device-varying — lax.cond/while require consistent variance types.
    """
    dim = q.shape[0]
    dtype = q.dtype
    if axis_name is not None:
        def _pv(x):
            x = jnp.asarray(x)
            vma = getattr(jax.typeof(x), "vma", frozenset())
            return x if axis_name in vma else jax.lax.pvary(x, axis_name)
    else:
        def _pv(x):
            return jnp.asarray(x)

    q, logp, grad = _pv(q), _pv(logp), _pv(grad)
    step_size, inv_mass = _pv(step_size), _pv(inv_mass)

    def logp_and_grad(qq):
        if logp_grad_fn is not None:
            val, g = logp_grad_fn(qq)
        else:
            val, g = jax.value_and_grad(logp_fn)(qq)
        # a non-finite gradient at a -inf point must not poison arithmetic
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return val, g

    key_mom, key_tree = jax.random.split(key)
    z0 = jax.random.normal(key_mom, (dim,), dtype)
    if inv_mass.ndim == 2:
        # dense metric: inv_mass is the (estimated posterior) covariance
        # Sigma = L Lᵀ, and momenta are N(0, M) with M = Sigma⁻¹, so
        # p = L⁻ᵀ z.  One dim x dim Cholesky + triangular solve per
        # transition — negligible next to the leapfrog logpost evals.
        # If the float32 Cholesky of an ill-conditioned estimate fails,
        # fall back to the diagonal of the metric for this WHOLE transition
        # (draw + kinetic + leapfrog use the same fallback, so the kernel
        # stays a valid HMC transition under that metric) instead of
        # emitting NaN momenta (under POOLED adaptation NaN momenta freeze
        # every chain at once and the run never recovers — see
        # _welford_finalize's PD floor for the matching producer-side fix).
        L_cov = jnp.linalg.cholesky(inv_mass)
        p_dense = jax.scipy.linalg.solve_triangular(L_cov.T, z0, lower=False)
        d = jnp.clip(jnp.diagonal(inv_mass), 1e-30, None)
        p_diag = z0 / jnp.sqrt(d)
        ok = jnp.all(jnp.isfinite(p_dense))
        inv_mass = jnp.where(ok, inv_mass, jnp.diag(d))
        p0 = jnp.where(ok, p_dense, p_diag)
    else:
        p0 = z0 / jnp.sqrt(inv_mass)
    energy0 = -logp + _kinetic(p0, inv_mass)

    init = _TreeState(
        q_prop=q, logp_prop=logp, grad_prop=grad,
        q_left=q, p_left=p0, grad_left=grad, logp_left=logp,
        q_right=q, p_right=p0, grad_right=grad, logp_right=logp,
        log_weight=jnp.asarray(0.0, dtype),
        sum_accept_prob=jnp.asarray(0.0, dtype),
        n_leapfrog=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
    )

    # checkpoint buffers for aligned-subtree U-turn checks
    ckpt_q = jnp.zeros((max_depth + 1, dim), dtype)
    ckpt_p = jnp.zeros((max_depth + 1, dim), dtype)
    if axis_name is not None:
        init = jax.tree.map(_pv, init)
        ckpt_q, ckpt_p = _pv(ckpt_q), _pv(ckpt_p)

    def extend_subtree(state, depth, direction, key):
        """Add 2^depth leapfrog steps in ``direction``; progressive
        multinomial sampling; per-aligned-subtree U-turn checks."""
        n_steps = 2**depth
        eps = direction * step_size

        def take_from(state):
            return _select(
                direction > 0,
                (state.q_right, state.p_right, state.grad_right,
                 state.logp_right),
                (state.q_left, state.p_left, state.grad_left,
                 state.logp_left))

        def leaf_body(i, carry):
            state, cq, cp, key, sub_logw = carry
            q0, p0_, g0, _ = take_from(state)
            q1, p1, logp1, g1 = _leapfrog(logp_and_grad, q0, p0_, g0, eps,
                                          inv_mass)
            energy1 = -logp1 + _kinetic(p1, inv_mass)
            delta = energy1 - energy0
            delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
            diverging = delta > _MAX_DELTA_ENERGY
            log_w_leaf = jnp.where(diverging, -jnp.inf, -delta)
            accept_prob = jnp.minimum(1.0, jnp.exp(-delta))

            # update endpoint in the travel direction
            state = _select(
                direction > 0,
                state._replace(q_right=q1, p_right=p1, grad_right=g1,
                               logp_right=logp1),
                state._replace(q_left=q1, p_left=p1, grad_left=g1,
                               logp_left=logp1))

            # progressive multinomial sampling within the new subtree
            sub_logw_new = jnp.logaddexp(sub_logw, log_w_leaf)
            key, sub = jax.random.split(key)
            accept_leaf = jnp.log(jax.random.uniform(sub, dtype=dtype)) \
                < (log_w_leaf - sub_logw_new)
            state = _select(
                accept_leaf & ~diverging,
                state._replace(q_prop=q1, logp_prop=logp1, grad_prop=g1),
                state)

            # ---- aligned-subtree checkpointing & U-turn checks
            # store the leaf as the opener of every subtree size 2^m with
            # i % 2^m == 0
            ms = jnp.arange(max_depth + 1)
            opens = (jnp.mod(i, 2**ms) == 0) & (ms >= 1) & (ms <= depth)
            cq = jnp.where(opens[:, None], q1[None, :], cq)
            cp = jnp.where(opens[:, None], p1[None, :], cp)
            # subtree of size 2^m ends at leaf i when (i+1) % 2^m == 0
            ends = (jnp.mod(i + 1, 2**ms) == 0) & (ms >= 1) & (ms <= depth)

            def check_m(m):
                # Orientation matters: the criterion dot(dq, p·) < 0 is NOT
                # symmetric under swapping the endpoints (dq flips sign but
                # the momenta don't), and OR-ing both orders is a tautology —
                # one of ±dq·p is negative for any non-orthogonal pair, which
                # fired "turning" at the first depth-1 extension and silently
                # capped every trajectory at ~3 leapfrogs.  Momenta stay
                # physically oriented under backward (eps < 0) integration,
                # so the forward-time order of a backward-travel subtree is
                # (current leaf) -> (subtree opener).
                fwd = _is_uturn(cq[m], q1, cp[m], p1, inv_mass)
                bwd = _is_uturn(q1, cq[m], p1, cp[m], inv_mass)
                return jnp.where(direction > 0, fwd, bwd)

            turning_sub = jnp.any(jnp.where(
                ends, jax.vmap(check_m)(jnp.arange(max_depth + 1)), False))

            state = state._replace(
                sum_accept_prob=state.sum_accept_prob + accept_prob,
                n_leapfrog=state.n_leapfrog + 1,
                turning=state.turning | turning_sub,
                diverging=state.diverging | diverging,
            )
            return (state, cq, cp, key, sub_logw_new)

        def cond_body(i, carry):
            state = carry[0]
            return _select(state.turning | state.diverging,
                           carry, leaf_body(i, carry))

        sub_logw0 = _pv(jnp.asarray(-jnp.inf, dtype))
        carry = (state, ckpt_q, ckpt_p, key, sub_logw0)
        carry = jax.lax.fori_loop(0, n_steps, cond_body, carry)
        state, _, _, _, sub_logw = carry
        return state, sub_logw

    def doubling_body(depth, carry):
        state, key, done = carry

        def do_double(carry):
            state, key, _ = carry
            key, k_dir, k_accept, k_sub = jax.random.split(key, 4)
            direction = jnp.where(jax.random.bernoulli(k_dir), 1.0, -1.0) \
                .astype(dtype)
            old_prop = (state.q_prop, state.logp_prop, state.grad_prop)
            old_logw = state.log_weight
            new_state, sub_logw = extend_subtree(state, depth, direction, k_sub)

            # multinomial acceptance of the new subtree's proposal vs the old
            # trajectory's (biased progressive sampling, Betancourt 2017)
            log_ratio = sub_logw - old_logw
            accept_new = (jnp.log(jax.random.uniform(k_accept, dtype=dtype))
                          < log_ratio) & ~new_state.diverging & ~new_state.turning
            state = _select(
                accept_new, new_state,
                new_state._replace(q_prop=old_prop[0], logp_prop=old_prop[1],
                                   grad_prop=old_prop[2]))
            state = state._replace(log_weight=jnp.logaddexp(old_logw, sub_logw))

            # whole-trajectory U-turn check
            turning_full = _is_uturn(state.q_left, state.q_right,
                                     state.p_left, state.p_right, inv_mass)
            state = state._replace(turning=state.turning | turning_full)
            done = state.turning | state.diverging
            return (state, key, done)

        return _select(done, carry, do_double(carry))

    state, _, _ = jax.lax.fori_loop(
        0, max_depth, doubling_body,
        (init, key_tree, _pv(jnp.asarray(False))))

    n = jnp.maximum(state.n_leapfrog, 1)
    info = {
        "accept_prob": state.sum_accept_prob / n,
        "n_leapfrog": state.n_leapfrog,
        "diverging": state.diverging,
        "energy": energy0,
    }
    return state.q_prop, state.logp_prop, state.grad_prop, info


# ------------------------------------------------------------------ adaptation

class WindowedAdaptation(NamedTuple):
    """Dual-averaging step size + Welford diagonal mass matrix."""

    log_eps: jax.Array
    log_eps_bar: jax.Array
    h_bar: jax.Array
    mu: jax.Array
    count: jax.Array
    welford_mean: jax.Array
    welford_m2: jax.Array
    welford_n: jax.Array
    inv_mass: jax.Array


def _adapt_init(eps0, dim, dtype, inv_mass0=None, dense: bool = False):
    if inv_mass0 is None:
        inv_mass0 = jnp.eye(dim, dtype=dtype) if dense \
            else jnp.ones((dim,), dtype)
    m2_shape = (dim, dim) if dense else (dim,)
    return WindowedAdaptation(
        log_eps=jnp.log(jnp.asarray(eps0, dtype)),
        log_eps_bar=jnp.asarray(0.0, dtype),
        h_bar=jnp.asarray(0.0, dtype),
        mu=jnp.log(10.0 * jnp.asarray(eps0, dtype)),
        count=jnp.asarray(0, jnp.int32),
        welford_mean=jnp.zeros((dim,), dtype),
        welford_m2=jnp.zeros(m2_shape, dtype),
        welford_n=jnp.asarray(0, jnp.int32),
        inv_mass=jnp.asarray(inv_mass0, dtype),
    )


def _hessian_diag_inv_mass(logp_grad, q):
    """Diagonal-curvature mass initialization: inv_mass_i = 1 / |d2(-logp)/dq_i2|.

    The diagonal Hessian comes from dim forward-over-reverse JVPs of the
    gradient — cheap at DSGE dimensions — falling back to central
    differences of the exact gradient when the graph rejects forward mode
    (custom_vjp filters, e.g. cyclostationary).  Coordinates with
    non-positive or
    non-finite curvature (off-mode saddle directions) fall back to unit.
    The windowed Welford estimator only has to REFINE this, not discover
    scale ratios of 1e4 from scratch — which its doubling windows cannot do
    (each window's estimate for a frozen coordinate reflects last window's
    random-walk distance, a feedback loop that escapes only geometrically).
    """
    dim = q.shape[0]
    eye = jnp.eye(dim, dtype=q.dtype)
    try:  # forward-over-reverse HVP; rejected if the graph has custom_vjp
        jax.eval_shape(
            lambda v: jax.jvp(lambda x: logp_grad(x)[1], (q,), (v,))[1],
            jax.ShapeDtypeStruct(q.shape, q.dtype))

        def hvp_diag(v):
            _, tangent = jax.jvp(lambda x: logp_grad(x)[1], (q,), (v,))
            return jnp.dot(v, tangent)
    except TypeError:  # central differences of the exact gradient instead
        h = jnp.finfo(q.dtype).eps ** (1.0 / 3.0)

        def hvp_diag(v):
            gp = logp_grad(q + h * v)[1]
            gm = logp_grad(q - h * v)[1]
            return jnp.dot(v, gp - gm) / (2.0 * h)

    neg_curv = -jax.vmap(hvp_diag)(eye)       # d2(-logp)/dq_i2
    good = jnp.isfinite(neg_curv) & (neg_curv > 1e-12)
    inv_mass = jnp.where(good, 1.0 / jnp.where(good, neg_curv, 1.0), 1.0)
    # unconstrained parameters are O(1): a near-flat direction at the init
    # point must not seed an absurd scale the windows cannot walk back
    return jnp.clip(inv_mass, 1e-6, 10.0)


def _dual_averaging_update(adapt, accept_prob, target=0.8, gamma=0.05,
                           t0=10.0, kappa=0.75):
    count = adapt.count + 1
    t = count.astype(adapt.log_eps.dtype)
    eta_h = 1.0 / (t + t0)
    h_bar = (1 - eta_h) * adapt.h_bar + eta_h * (target - accept_prob)
    log_eps = adapt.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1 - eta) * adapt.log_eps_bar
    return adapt._replace(log_eps=log_eps, log_eps_bar=log_eps_bar,
                          h_bar=h_bar, count=count)


def _welford_update(adapt, q):
    n = adapt.welford_n + 1
    delta = q - adapt.welford_mean
    mean = adapt.welford_mean + delta / n
    if adapt.welford_m2.ndim == 2:
        m2 = adapt.welford_m2 + jnp.outer(delta, q - mean)
    else:
        m2 = adapt.welford_m2 + delta * (q - mean)
    return adapt._replace(welford_mean=mean, welford_m2=m2, welford_n=n)


def _welford_update_batch(adapt, qs, axis_name=None):
    """Chan-et-al merge of one step's cross-chain batch into the running
    Welford state; with ``axis_name`` the batch statistics are pooled over
    the device mesh too (psum of sufficient statistics rides the ICI)."""
    dtype = adapt.welford_m2.dtype
    dense = adapt.welford_m2.ndim == 2
    c = jnp.asarray(qs.shape[0], dtype)
    s1 = jnp.sum(qs, axis=0)
    s2 = qs.T @ qs if dense else jnp.sum(qs * qs, axis=0)
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    b_mean = s1 / c
    b_m2 = s2 - (jnp.outer(s1, s1) if dense else s1 * s1) / c
    n_old = adapt.welford_n.astype(dtype)
    n_new = n_old + c
    delta = b_mean - adapt.welford_mean
    mean = adapt.welford_mean + delta * (c / n_new)
    dd = jnp.outer(delta, delta) if dense else delta * delta
    m2 = adapt.welford_m2 + b_m2 + dd * (n_old * c / n_new)
    return adapt._replace(welford_mean=mean, welford_m2=m2,
                          welford_n=adapt.welford_n + c.astype(jnp.int32))


def _welford_finalize(adapt, prev_anchor: bool = False):
    n = jnp.maximum(adapt.welford_n, 2).astype(adapt.welford_m2.dtype)
    var = adapt.welford_m2 / (n - 1)
    dense = var.ndim == 2
    # Stan regularizes each window's variance toward the constant 1e-3.  For
    # a curvature-seeded metric (mass_init="hessian") that would OVERWRITE
    # the good seed with the first window's noisy estimate, so seeded runs
    # regularize toward the PREVIOUS metric instead — a window whose chains
    # barely traveled a direction keeps the old scale rather than collapsing
    # it.  Unit-seeded runs keep Stan's behavior exactly.  For a dense
    # metric the anchor is (the matrix form of) the same thing; shrinking
    # a PSD sample covariance toward a PD anchor keeps the metric PD even
    # when a window has fewer draws than dimensions.
    if prev_anchor:
        anchor = adapt.inv_mass
    elif dense:
        anchor = 1e-3 * jnp.eye(var.shape[0], dtype=var.dtype)
    else:
        anchor = 1e-3
    var = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * anchor
    if dense:
        var = 0.5 * (var + var.T)
        # PD safety floor.  A window whose chains barely moved (or froze —
        # e.g. after rejected transitions) yields a rank-deficient sample
        # covariance whose float32 Cholesky fails; with POOLED adaptation
        # one failed Cholesky NaNs every chain's momenta, freezing all
        # chains, which makes the NEXT window's covariance singular too —
        # a self-locking 100%-divergence state (observed on SW-2007
        # full-block, seed-dependent).  A relative ridge keeps the metric
        # PD under f32 rounding, and a non-finite estimate falls back to
        # the anchor rather than poisoning the run permanently.
        dim = var.shape[0]
        anchor_mat = (anchor if prev_anchor
                      else 1e-3 * jnp.eye(dim, dtype=var.dtype))
        finite = jnp.all(jnp.isfinite(var))
        var = jnp.where(finite, var, anchor_mat)
        eps_rel = 1e-6 if var.dtype == jnp.float32 else 1e-12
        ridge = eps_rel * (jnp.trace(var) / dim + 1e-30)
        var = var + ridge * jnp.eye(dim, dtype=var.dtype)
    return adapt._replace(
        inv_mass=var,
        welford_mean=jnp.zeros_like(adapt.welford_mean),
        welford_m2=jnp.zeros_like(adapt.welford_m2),
        welford_n=jnp.asarray(0, jnp.int32),
    )


def _window_schedule(num_warmup: int):
    """Stan's three-phase schedule: fast, doubling slow windows, fast."""
    if num_warmup < 20:
        return np.zeros(num_warmup, dtype=bool), np.zeros(num_warmup, dtype=bool)
    init_fast = int(0.15 * num_warmup)
    term_fast = int(0.1 * num_warmup)
    slow_len = num_warmup - init_fast - term_fast
    in_slow = np.zeros(num_warmup, dtype=bool)
    in_slow[init_fast:init_fast + slow_len] = True
    window_end = np.zeros(num_warmup, dtype=bool)
    # doubling windows inside the slow phase: 25, 50, 100, ... (last absorbs)
    start = init_fast
    w = max(25, slow_len // 15)
    while start < init_fast + slow_len:
        end = min(start + w, init_fast + slow_len)
        if init_fast + slow_len - end < w * 2:
            end = init_fast + slow_len
        window_end[end - 1] = True
        start = end
        w *= 2
    return in_slow, window_end




# ------------------------------------------------------------------- sampling

class NUTSResult(NamedTuple):
    samples: jax.Array           # (chains, draws, dim) unconstrained
    logp: jax.Array              # (chains, draws)
    accept_prob: jax.Array       # (chains, draws)
    diverging: jax.Array         # (chains, draws)
    n_leapfrog: jax.Array        # (chains, draws)
    step_size: jax.Array         # (chains,)
    inv_mass: jax.Array          # (chains, dim) or (chains, dim, dim) dense


# Compiled sampler programs are memoized on configuration identity: a second
# ``sample_nuts``/``fit`` call with the SAME logpost object and
# hyper-parameters reuses the jitted executables instead of retracing fresh
# closures (repeat fits, benchmark second passes, checkpoint restarts).
# Pair with ``DSGEStateSpace``'s builder cache, which returns the same
# logpost object for identical (data, kwargs).
_SAMPLER_CACHE: OrderedDict = OrderedDict()
_SAMPLER_CACHE_SIZE = 8


def _memoized_programs(cache_key, builder):
    if cache_key is None:            # tracer-driven: never cache across traces
        return builder()
    hit = _SAMPLER_CACHE.get(cache_key)
    if hit is None:
        hit = builder()
        _SAMPLER_CACHE[cache_key] = hit
        while len(_SAMPLER_CACHE) > _SAMPLER_CACHE_SIZE:
            _SAMPLER_CACHE.popitem(last=False)
    else:
        _SAMPLER_CACHE.move_to_end(cache_key)
    return hit


def _maybe_shard(fn, mesh, in_specs, out_specs):
    """shard_map-wrap ``fn`` over ``mesh`` (identity when mesh is None)."""
    if mesh is None:
        return fn
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_rep=False)


def sample_nuts(
    logp_fn: Callable,
    initial_position: jax.Array,     # (chains, dim)
    key,
    num_warmup: int = 500,
    num_samples: int = 500,
    max_depth: int = 8,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    pooled: bool = False,
    axis_name: str | None = None,
    logp_grad_fn: Callable | None = None,
    mass_init: str = "unit",
    mass_matrix: str = "diag",
    segment_size: int | None = None,
    mesh=None,
) -> NUTSResult:
    """Run vmapped NUTS chains.

    ``mesh`` (a ``jax.sharding.Mesh``) shards the chain axis over devices:
    chain blocks run data-parallel under ``shard_map``, and with
    ``pooled=True`` the warmup's Welford/acceptance statistics are pooled
    across the whole mesh with psum/pmean collectives over the ICI (the
    reference's multi-process chain parallelism, ``pm.sample(chains=...)`` /
    reference ``gEconpy/model/statespace.py:833``, re-designed TPU-native).
    ``num_chains`` must divide the mesh size.  Chain key streams are split
    per chain on the host either way, so an unpooled sharded run matches
    the single-device one to XLA batching round-off; a pooled sharded run
    additionally depends on the psum reduction order.

    ``segment_size`` bounds the length of any single device program: the
    warmup and sampling loops execute in segments of at most that many
    draws, with a host synchronization between segments.  Key streams are
    pre-split, so results are identical to the single-program default —
    use it when a runtime caps per-call execution time (e.g. an RPC
    deadline on a remote-device tunnel) or to bound time-to-interrupt on
    very long runs.  Composes with ``mesh``.

    ``mass_init="hessian"`` seeds the diagonal mass matrix from the negative
    log-posterior curvature at each chain's initial position (ideal when
    starting at/near the posterior mode, cf. ``fit(init="map")``); the
    windowed Welford estimate then refines it.  ``"unit"`` is the classic
    identity start.

    ``mass_matrix="dense"`` adapts a FULL covariance metric instead of a
    diagonal one: the windowed estimator accumulates the cross-chain (and,
    pooled, cross-mesh) sample covariance, momenta are drawn from its
    inverse, and the leapfrog/U-turn inner products use the full matrix.
    For strongly correlated posteriors (DSGE persistence/variance pairs)
    this raises effective sample size per draw by the correlation's
    condition factor; at DSGE dimensions (tens of parameters) the extra
    dim x dim algebra per transition is negligible next to one leapfrog
    logpost gradient.  Pooling is recommended — a dense estimate from one
    chain's short window is noisy, while the pooled estimator sees
    chains x window draws.

    ``logp_fn(q) -> scalar`` must be jittable; chains are vmapped, so the
    whole sampler is one XLA program.  Warmup adapts step size (dual
    averaging) and a diagonal mass matrix (Stan-style windows) per chain.

    ``pooled=True`` shares adaptation ACROSS chains (nutpie/cross-chain
    warmup style): one step size driven by the pooled mean acceptance and
    one mass matrix from the cross-chain Welford estimate — each warmup
    window then carries ``n_chains``x the information, so short warmups
    work with many chains.  ``axis_name`` additionally pools the
    sufficient statistics across an ambient ``shard_map``/``pmap`` mesh
    axis (set automatically when ``mesh`` is given).
    """
    initial_position = jnp.asarray(initial_position)
    n_chains, dim = initial_position.shape
    dtype = initial_position.dtype

    is_tracer = isinstance(initial_position, jax.core.Tracer) \
        or isinstance(key, jax.core.Tracer)
    if mesh is not None:
        if is_tracer:
            raise ValueError("mesh=... requires concrete (host) inputs; "
                             "inside jit/shard_map pass axis_name instead")
        if axis_name is None:
            axis_name = mesh.axis_names[0]
        if n_chains % mesh.devices.size:
            raise ValueError(
                f"num_chains={n_chains} must be divisible by the mesh size "
                f"{mesh.devices.size}")
    if is_tracer:
        # inside jit / shard_map there is no host boundary to segment at
        segment_size = None

    if mass_init not in ("unit", "hessian"):
        raise ValueError(f"mass_init must be 'unit' or 'hessian', "
                         f"got {mass_init!r}")
    if mass_matrix not in ("diag", "dense"):
        raise ValueError(f"mass_matrix must be 'diag' or 'dense', "
                         f"got {mass_matrix!r}")
    dense = mass_matrix == "dense"

    in_slow_np, window_end_np = _window_schedule(num_warmup)

    cache_key = None if is_tracer else (
        logp_fn, logp_grad_fn, pooled, axis_name, mesh, num_warmup,
        num_samples, max_depth, float(initial_step_size),
        float(target_accept), mass_init, mass_matrix, str(dtype))
    build = _build_pooled_programs if pooled else _build_unpooled_programs
    programs = _memoized_programs(cache_key, lambda: build(
        logp_fn, logp_grad_fn, num_warmup, num_samples, max_depth,
        float(initial_step_size), target_accept, mass_init, axis_name, mesh,
        jnp.asarray(in_slow_np), jnp.asarray(window_end_np), dense=dense))

    chain_keys = jax.random.split(key, n_chains)

    if mass_init == "hessian":
        if is_tracer:
            inv_mass0 = jax.vmap(
                lambda q: _hessian_diag_inv_mass(programs["logp_grad"], q)
            )(initial_position)
        else:
            inv_mass0 = programs["hess_mass"](initial_position)
    else:
        inv_mass0 = None

    run = _run_pooled if pooled else _run_unpooled
    return run(programs, initial_position, chain_keys, inv_mass0,
               num_warmup, num_samples, initial_step_size, segment_size,
               is_tracer, dense=dense)


# ------------------------------------------------- unpooled (per-chain) chains

def _build_unpooled_programs(logp_fn, logp_grad_fn, num_warmup, num_samples,
                             max_depth, initial_step_size, target_accept,
                             mass_init, axis_name, mesh, in_slow, window_end,
                             dense: bool = False):
    from jax.sharding import PartitionSpec as P

    ax = None if mesh is None else axis_name
    prev_anchor = mass_init == "hessian"

    def logp_grad(q):
        if logp_grad_fn is not None:
            val, g = logp_grad_fn(q)
        else:
            val, g = jax.value_and_grad(logp_fn)(q)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return val, g

    def warmup_step(carry, inputs):
        step_idx, key = inputs
        q, logp, grad, adapt = carry
        key, k_kernel = jax.random.split(key)
        eps = jnp.exp(adapt.log_eps)
        q, logp, grad, info = nuts_kernel(
            logp_fn, q, logp, grad, k_kernel, eps, adapt.inv_mass, max_depth,
            logp_grad_fn=logp_grad_fn)
        adapt = _dual_averaging_update(adapt, info["accept_prob"],
                                       target=target_accept)
        adapt = jax.lax.cond(in_slow[step_idx],
                             lambda a: _welford_update(a, q), lambda a: a,
                             adapt)

        def finalize(a):
            a = _welford_finalize(a, prev_anchor=prev_anchor)
            # restart dual averaging around the current step size
            return a._replace(mu=jnp.log(10.0) + a.log_eps,
                              h_bar=jnp.zeros_like(a.h_bar),
                              count=jnp.zeros_like(a.count))

        adapt = jax.lax.cond(window_end[step_idx], finalize, lambda a: a,
                             adapt)
        return (q, logp, grad, adapt), None

    def sample_step(carry, key):
        q, logp, grad, eps, inv_mass = carry
        q, logp, grad, info = nuts_kernel(
            logp_fn, q, logp, grad, key, eps, inv_mass, max_depth,
            logp_grad_fn=logp_grad_fn)
        out = (q, logp, info["accept_prob"], info["diverging"],
               info["n_leapfrog"])
        return (q, logp, grad, eps, inv_mass), out

    def one_chain(q0, chain_key, im0):
        dim = q0.shape[0]
        logp0, grad0 = logp_grad(q0)
        adapt = _adapt_init(initial_step_size, dim, q0.dtype, inv_mass0=im0,
                            dense=dense)
        warm_keys = jax.random.split(chain_key, num_warmup + 1)
        carry = (q0, logp0, grad0, adapt)
        (q, logp, grad, adapt), _ = jax.lax.scan(
            warmup_step, carry,
            (jnp.arange(num_warmup), warm_keys[:num_warmup]))
        eps_final = jnp.exp(adapt.log_eps_bar)
        sample_keys = jax.random.split(warm_keys[-1], num_samples)
        carry = (q, logp, grad, eps_final, adapt.inv_mass)
        _, (qs, logps, accepts, divs, n_leaps) = jax.lax.scan(
            sample_step, carry, sample_keys)
        return qs, logps, accepts, divs, n_leaps, eps_final, adapt.inv_mass

    run_all_raw = jax.vmap(one_chain)

    def warm_seg_raw(carry, idxs, keys):
        def one(c, ks):
            out, _ = jax.lax.scan(warmup_step, c, (idxs, ks))
            return out
        return jax.vmap(one)(carry, keys)

    def sample_seg_raw(carry, keys):
        return jax.vmap(lambda c, ks: jax.lax.scan(sample_step, c, ks))(
            carry, keys)

    chain_spec = (P(ax), P(ax), P(ax))
    out_spec = tuple(P(ax) for _ in range(7))
    carry4 = (P(ax), P(ax), P(ax), P(ax))
    carry5 = (P(ax),) * 5
    return {
        "logp_grad": logp_grad,
        "run_all_raw": run_all_raw,
        "run_all": jax.jit(_maybe_shard(run_all_raw, mesh, chain_spec,
                                        out_spec)),
        "init_vag": jax.jit(_maybe_shard(jax.vmap(logp_grad), mesh, P(ax),
                                         (P(ax), P(ax)))),
        "warm_seg": jax.jit(_maybe_shard(warm_seg_raw, mesh,
                                         (carry4, P(None), P(ax)), carry4)),
        "sample_seg": jax.jit(_maybe_shard(
            sample_seg_raw, mesh, (carry5, P(ax)),
            (carry5, (P(ax),) * 5))),
        "hess_mass": jax.jit(_maybe_shard(
            jax.vmap(lambda q: _hessian_diag_inv_mass(logp_grad, q)),
            mesh, P(ax), P(ax))),
    }


def _run_unpooled(programs, initial_position, chain_keys, inv_mass0,
                  num_warmup, num_samples, initial_step_size, segment_size,
                  is_tracer, dense: bool = False):
    n_chains, dim = initial_position.shape
    dtype = initial_position.dtype

    if inv_mass0 is None:
        inv_mass0 = jnp.ones((n_chains, dim), dtype)
    if dense and inv_mass0.ndim == 2:     # per-chain diagonal seed -> matrix
        inv_mass0 = jax.vmap(jnp.diag)(inv_mass0)

    if segment_size is None:
        runner = programs["run_all_raw"] if is_tracer else programs["run_all"]
        qs, logps, accepts, divs, n_leaps, eps_final, inv_mass = runner(
            initial_position, chain_keys, inv_mass0)
        return NUTSResult(qs, logps, accepts, divs, n_leaps, eps_final,
                          inv_mass)

    # ---- segmented execution: same step functions, same key streams, but
    # the scans run in bounded slices with a host sync between them.
    warm_keys = jax.vmap(lambda k: jax.random.split(k, num_warmup + 1))(
        chain_keys)                                   # (chains, W+1, 2)
    logps0, grads0 = programs["init_vag"](initial_position)
    adapt = jax.vmap(
        lambda im: _adapt_init(initial_step_size, dim, dtype, inv_mass0=im,
                               dense=dense)
    )(inv_mass0)

    carry = (initial_position, logps0, grads0, adapt)
    for lo in range(0, num_warmup, segment_size):
        hi = min(lo + segment_size, num_warmup)
        carry = programs["warm_seg"](carry, jnp.arange(lo, hi),
                                     warm_keys[:, lo:hi])
        jax.block_until_ready(carry)
    q, logp, grad, adapt = carry

    eps_final = jnp.exp(adapt.log_eps_bar)
    inv_mass = adapt.inv_mass
    sample_keys = jax.vmap(lambda k: jax.random.split(k, num_samples))(
        warm_keys[:, -1])                             # (chains, S, 2)

    carry = (q, logp, grad, eps_final, inv_mass)
    outs = []
    for lo in range(0, num_samples, segment_size):
        hi = min(lo + segment_size, num_samples)
        carry, out = programs["sample_seg"](carry, sample_keys[:, lo:hi])
        jax.block_until_ready(out)
        outs.append(out)
    qs, logps, accepts, divs, n_leaps = (
        jnp.concatenate(parts, axis=1) for parts in zip(*outs))
    return NUTSResult(qs, logps, accepts, divs, n_leaps, eps_final, inv_mass)


# -------------------------------------------------- pooled cross-chain warmup

def _build_pooled_programs(logp_fn, logp_grad_fn, num_warmup, num_samples,
                           max_depth, initial_step_size, target_accept,
                           mass_init, axis_name, mesh, in_slow, window_end,
                           dense: bool = False):
    """Cross-chain pooled warmup: shared step size + shared mass matrix.

    The step loop is the outer scan and chains run vmapped inside it, so
    every chain sees the same adaptation state each step (and, with
    ``axis_name``/``mesh``, the same state across all devices — psums of
    the Welford sufficient statistics ride the ICI)."""
    from jax.sharding import PartitionSpec as P

    ax = axis_name
    prev_anchor = mass_init == "hessian"

    def logp_grad(q):
        if logp_grad_fn is not None:
            val, g = logp_grad_fn(q)
        else:
            val, g = jax.value_and_grad(logp_fn)(q)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return val, g

    def kernel_all(qs, logps, grads, keys, eps, inv_mass):
        return jax.vmap(lambda q, l, g, k: nuts_kernel(
            logp_fn, q, l, g, k, eps, inv_mass, max_depth,
            axis_name=ax, logp_grad_fn=logp_grad_fn))(
            qs, logps, grads, keys)

    def warmup_step(carry, inputs):
        step_idx, keys = inputs                     # keys: (chains, 2)
        qs, logps, grads, adapt = carry
        eps = jnp.exp(adapt.log_eps)
        qs, logps, grads, info = kernel_all(qs, logps, grads, keys, eps,
                                            adapt.inv_mass)
        acc = jnp.mean(info["accept_prob"])
        if ax is not None:
            acc = jax.lax.pmean(acc, ax)
        adapt = _dual_averaging_update(adapt, acc, target=target_accept)
        # masked selects instead of lax.cond: under shard_map the psum
        # branch and the identity branch carry different device-variance
        # types, which cond rejects
        upd = _welford_update_batch(adapt, qs, ax)
        adapt = jax.tree.map(
            lambda a, b: jnp.where(in_slow[step_idx], b, a), adapt, upd)

        fin = _welford_finalize(adapt, prev_anchor=prev_anchor)
        fin = fin._replace(mu=jnp.log(10.0) + fin.log_eps,
                           h_bar=jnp.zeros_like(fin.h_bar),
                           count=jnp.zeros_like(fin.count))
        adapt = jax.tree.map(
            lambda a, b: jnp.where(window_end[step_idx], b, a), adapt, fin)
        return (qs, logps, grads, adapt), None

    def sample_step(carry, keys):                   # keys: (chains, 2)
        qs, logps, grads, eps, inv_mass = carry
        qs, logps, grads, info = kernel_all(qs, logps, grads, keys, eps,
                                            inv_mass)
        out = (qs, logps, info["accept_prob"], info["diverging"],
               info["n_leapfrog"])
        return (qs, logps, grads, eps, inv_mass), out

    def warm_seg_raw(carry, idxs, keys):            # keys: (k, chains, 2)
        out, _ = jax.lax.scan(warmup_step, carry, (idxs, keys))
        return out

    def sample_seg_raw(carry, keys):                # keys: (k, chains, 2)
        return jax.lax.scan(sample_step, carry, keys)

    carry_spec = (P(ax), P(ax), P(ax), P())         # adapt state replicated
    scarry_spec = (P(ax), P(ax), P(ax), P(), P())
    keys_spec = P(None, ax)
    return {
        "logp_grad": logp_grad,
        "warm_seg_raw": warm_seg_raw,
        "sample_seg_raw": sample_seg_raw,
        "init_vag": jax.jit(_maybe_shard(jax.vmap(logp_grad), mesh, P(ax),
                                         (P(ax), P(ax)))),
        "warm_seg": jax.jit(_maybe_shard(
            warm_seg_raw, mesh, (carry_spec, P(None), keys_spec),
            carry_spec)),
        "sample_seg": jax.jit(_maybe_shard(
            sample_seg_raw, mesh, (scarry_spec, keys_spec),
            (scarry_spec, (keys_spec,) * 5))),
        "hess_mass": jax.jit(_maybe_shard(
            jax.vmap(lambda q: _hessian_diag_inv_mass(logp_grad, q)),
            mesh, P(ax), P(ax))),
    }


def _run_pooled(programs, initial_position, chain_keys, inv_mass0,
                num_warmup, num_samples, initial_step_size, segment_size,
                is_tracer, dense: bool = False):
    n_chains, dim = initial_position.shape
    dtype = initial_position.dtype

    if inv_mass0 is not None and inv_mass0.ndim == 2:
        inv_mass0 = jnp.mean(inv_mass0, axis=0)    # per-chain diag seeds
    if dense and inv_mass0 is not None and inv_mass0.ndim == 1:
        inv_mass0 = jnp.diag(inv_mass0)

    # per-chain key streams (device-count invariant: chain i's stream only
    # depends on chain_keys[i], however the chain axis is sharded)
    total = num_warmup + num_samples
    per_chain = jax.vmap(lambda ck: jax.random.split(ck, total))(chain_keys)
    warm_keys = jnp.swapaxes(per_chain[:, :num_warmup], 0, 1)    # (W, C, 2)
    samp_keys = jnp.swapaxes(per_chain[:, num_warmup:], 0, 1)    # (S, C, 2)

    if is_tracer:
        logps0, grads0 = jax.vmap(programs["logp_grad"])(initial_position)
    else:
        logps0, grads0 = programs["init_vag"](initial_position)
    adapt = _adapt_init(initial_step_size, dim, dtype, inv_mass0=inv_mass0,
                        dense=dense)

    carry = (initial_position, logps0, grads0, adapt)
    if is_tracer:
        carry = programs["warm_seg_raw"](carry, jnp.arange(num_warmup),
                                         warm_keys)
    else:
        step = segment_size or max(num_warmup, 1)
        for lo in range(0, num_warmup, step):
            hi = min(lo + step, num_warmup)
            carry = programs["warm_seg"](carry, jnp.arange(lo, hi),
                                         warm_keys[lo:hi])
            jax.block_until_ready(carry)
    qs, logps, grads, adapt = carry

    eps_final = jnp.exp(adapt.log_eps_bar)
    carry = (qs, logps, grads, eps_final, adapt.inv_mass)
    if is_tracer:
        _, (qs_all, logps_all, accepts, divs, n_leaps) = \
            programs["sample_seg_raw"](carry, samp_keys)
    else:
        step = segment_size or max(num_samples, 1)
        outs = []
        for lo in range(0, num_samples, step):
            hi = min(lo + step, num_samples)
            carry, out = programs["sample_seg"](carry, samp_keys[lo:hi])
            jax.block_until_ready(out)
            outs.append(out)
        qs_all, logps_all, accepts, divs, n_leaps = (
            jnp.concatenate(parts, axis=0) for parts in zip(*outs))

    # scan stacked on the draw axis: (draws, chains, ...) -> (chains, draws)
    samples = jnp.swapaxes(qs_all, 0, 1)
    return NUTSResult(
        samples, jnp.swapaxes(logps_all, 0, 1),
        jnp.swapaxes(accepts, 0, 1), jnp.swapaxes(divs, 0, 1),
        jnp.swapaxes(n_leaps, 0, 1),
        jnp.broadcast_to(eps_final, (n_chains,)),
        jnp.broadcast_to(adapt.inv_mass,
                         (n_chains,) + adapt.inv_mass.shape))
