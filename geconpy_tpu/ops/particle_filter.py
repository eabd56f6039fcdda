"""Bootstrap particle filter for nonlinear state spaces.

Companion to ``ops/ukf.py`` for likelihood evaluation on the pruned
second-order state space (``models/second_order.py``) — the reference
(gEconpy) has no nonlinear filter at all (first-order estimation only via
the linear Kalman filter, ``gEconpy/model/statespace.py:1139``).

TPU-first design:

- particles live in a (N, n) batch; propagation and weighting are one
  ``vmap``'d transition / density evaluation per step inside ``lax.scan`` —
  MXU-friendly, zero host sync, static shapes throughout;
- **systematic resampling** via cumsum + ``searchsorted`` (both XLA-native):
  one uniform draw per step, O(N log N) gather, far lower weight variance
  than multinomial;
- missing observations masked exactly as ``ops/kalman.py`` (weight
  contributions count observed rows only);
- failure = flags (non-finite increments freeze the loglik and flip
  ``success``), never exceptions — PMMH proposals with explosive draws must
  reject, not crash the batch.

The estimator of the marginal likelihood  prod_t (1/N) sum_i w_t^i  is
unbiased (Del Moral 1996), which is what particle-marginal Metropolis
Hastings requires.  The loglik is NOT differentiable through resampling
(the index gather has zero gradient a.e.) — use ``ops/ukf.py`` for
gradient-based (NUTS) estimation and this filter for accuracy checks,
marginal-data-density comparisons, and PMMH.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .precision import highest_precision

__all__ = ["ParticleFilterResult", "particle_filter_loglik",
           "systematic_resample"]

_LOG2PI = 1.8378770664093453


class ParticleFilterResult(NamedTuple):
    loglik: jax.Array          # scalar: unbiased log marginal likelihood
    loglik_t: jax.Array        # (periods,) per-period increments
    ess_t: jax.Array           # (periods,) effective sample size pre-resample
    filtered_mean: jax.Array   # (periods, n) weighted particle means
    success: jax.Array


def systematic_resample(key, log_w, particles):
    """Systematic (low-variance) resampling.

    One uniform offset u ~ U[0, 1/N) places N equally spaced points on the
    weight CDF; ``searchsorted`` maps them to ancestor indices.  Keeps the
    particle count static and the gather XLA-native.
    """
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cdf = jnp.cumsum(w)
    u = (jax.random.uniform(key, ()) + jnp.arange(n, dtype=w.dtype)) / n
    idx = jnp.searchsorted(cdf, u, side="right")
    idx = jnp.clip(idx, 0, n - 1)
    return jax.tree_util.tree_map(lambda p: p[idx], particles)


@highest_precision
def particle_filter_loglik(key, y, init_particles, transition: Callable,
                           observe: Callable, Q, H,
                           ess_threshold: float = 0.5
                           ) -> ParticleFilterResult:
    """Bootstrap particle filter log-likelihood.

    Parameters
    ----------
    key
        PRNG key; consumed for shock draws and resampling.
    y
        (periods, k_obs) data, NaN = missing.
    init_particles
        (N, n) initial particle cloud (e.g. draws from N(x0, P0)).
    transition
        ``transition(x, eps) -> x_next`` with eps ~ N(0, Q) supplied by the
        filter.
    observe
        ``observe(x) -> (k_obs,)`` predicted observation; measurement noise
        is additive N(0, H) and must have H > 0 on observed rows (the
        bootstrap proposal needs a density).
    ess_threshold
        resample when ESS < threshold * N (1.0 = always resample).

    Returns ``ParticleFilterResult`` with the unbiased log marginal
    likelihood estimate.
    """
    y = jnp.asarray(y)
    particles = jnp.asarray(init_particles)
    dtype = particles.dtype
    n_particles, n = particles.shape
    Q = jnp.asarray(Q, dtype)
    H = jnp.asarray(H, dtype)
    k = H.shape[0]
    q = Q.shape[0]
    chol_Q = jnp.linalg.cholesky(Q)

    v_trans = jax.vmap(transition)
    v_obs = jax.vmap(observe)
    periods = y.shape[0]
    keys = jax.random.split(key, periods)

    def obs_logdensity_batch(y_eff, maskf, y_hat):
        # masked Gaussian density per particle: missing rows get unit
        # variance and a zero innovation, contributing nothing (same scheme
        # as ops/kalman).  The factorization is particle-invariant — done
        # once per step, the per-particle work is one triangular solve batch.
        V = (y_eff[None, :] - y_hat) * maskf[None, :]       # (N, k)
        Hm = H * jnp.outer(maskf, maskf) + jnp.diag(1.0 - maskf)
        cholm = jnp.linalg.cholesky(Hm)
        W = jax.scipy.linalg.cho_solve((cholm, True), V.T)   # (k, N)
        quad = jnp.sum(V.T * W, axis=0)                      # (N,)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(cholm)))
        n_obs_t = jnp.sum(maskf)
        return -0.5 * (n_obs_t * _LOG2PI + logdet + quad)

    def step(carry, inp):
        parts, log_w, ll_sum, ok = carry
        y_t, key_t = inp
        k_eps, k_res = jax.random.split(key_t)

        # adaptive resample (masked select keeps vmap-safety; the resampled
        # cloud resets weights to uniform)
        ess = 1.0 / jnp.sum(jax.nn.softmax(log_w) ** 2)
        do_resample = ess < ess_threshold * n_particles
        resampled = systematic_resample(k_res, log_w, parts)
        parts = jnp.where(do_resample, resampled, parts)
        log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)

        # propagate with fresh shock draws
        eps = jax.random.normal(k_eps, (n_particles, q), dtype) @ chol_Q.T
        parts_next = v_trans(parts, eps)

        # weight by the masked measurement density
        mask = jnp.isfinite(y_t)
        maskf = mask.astype(dtype)
        y_eff = jnp.where(mask, y_t, 0.0)
        y_hat = v_obs(parts_next)
        log_inc = obs_logdensity_batch(y_eff, maskf, y_hat)

        log_w_new = log_w + log_inc
        # unbiased increment: log( sum w_prev_norm * inc ) — with uniform
        # weights after resampling this is logsumexp - logN
        ll_t = jax.scipy.special.logsumexp(log_w_new) \
            - jax.scipy.special.logsumexp(log_w)
        step_ok = jnp.isfinite(ll_t)
        ll_t_safe = jnp.where(step_ok, ll_t, 0.0)

        w_norm = jax.nn.softmax(log_w_new)
        mean_t = w_norm @ parts_next

        return ((parts_next, log_w_new, ll_sum + ll_t_safe, ok & step_ok),
                (ll_t_safe, ess, mean_t))

    log_w0 = jnp.zeros((n_particles,), dtype)
    init = (particles, log_w0, jnp.asarray(0.0, dtype), jnp.asarray(True))
    (_, _, ll, ok), (ll_t, ess_t, means) = jax.lax.scan(
        step, init, (y, keys))
    ok = ok & jnp.all(jnp.isfinite(means[-1]))
    return ParticleFilterResult(ll, ll_t, ess_t, means, ok)
