"""Particle-marginal Metropolis-Hastings (PMMH) for second-order estimation.

Pairs with ``ops/particle_filter.py``: the bootstrap filter's marginal
likelihood estimate is unbiased, so plugging it into a Metropolis accept
ratio targets the EXACT posterior of the pruned second-order model
(Andrieu-Doucet-Holenstein 2010) — no Gaussian (UKF) approximation.  The
trade is gradient-free mixing: use ``fit(order=2)`` (UKF + NUTS) for speed,
and PMMH to check the UKF posterior or when the Gaussian approximation is
suspect (large shocks / strong curvature).

TPU-first mechanics:

- chains are vmapped: every chain's particle filter runs in one batched
  program (particles x chains on the same device);
- adaptive random-walk proposal in unconstrained space: per-chain Robbins-
  Monro scale tuning toward the 0.234 optimal acceptance rate during
  warmup — all inside ``lax.scan``, no host round-trips;
- likelihood estimates are refreshed per proposal only (the chain keeps the
  estimate of the current point — the standard PMMH construction that keeps
  the invariant distribution exact despite estimator noise).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PMMHResult", "sample_pmmh"]


class PMMHResult(NamedTuple):
    samples: jax.Array         # (chains, draws, dim) unconstrained
    loglik: jax.Array          # (chains, draws) PF estimate at each draw
    accept_rate: jax.Array     # (chains,)
    scale: jax.Array           # (chains,) final proposal scale


def sample_pmmh(loglik_fn: Callable, logprior_fn: Callable,
                initial_position, key, num_warmup: int = 500,
                num_samples: int = 1000, initial_scale: float = 0.1,
                target_accept: float = 0.234,
                segment_size: int | None = None) -> PMMHResult:
    """Run vmapped PMMH chains.

    Parameters
    ----------
    loglik_fn
        ``(u, key) -> (loglik_estimate, success)`` — e.g.
        ``DSGEStateSpace.build_pf_loglik_second_order(data)``.  Must be
        jittable; the estimator is re-drawn (fresh key) for every proposal.
    logprior_fn
        ``u -> scalar`` log prior density in unconstrained space (including
        transform jacobians).
    initial_position
        (chains, dim) unconstrained starting points.  Start at
        finite-posterior points (e.g. ``DSGEStateSpace.initial_position``);
        a chain whose start has zero likelihood can only escape by a lucky
        proposal.
    key
        PRNG key.

    ``segment_size`` bounds any single device program to that many
    iterations (host sync between slices, identical key stream/results) —
    for runtimes that cap per-call execution time, e.g. remote-device
    tunnels with RPC deadlines.

    Returns draws in unconstrained space (constrain with
    ``DSGEStateSpace.constrain``).
    """
    q0 = jnp.asarray(initial_position)
    n_chains, dim = q0.shape
    dtype = q0.dtype
    total = num_warmup + num_samples

    def logpost_parts(u, k):
        ll, ok = loglik_fn(u, k)
        lp = logprior_fn(u)
        ok = ok & jnp.isfinite(ll) & jnp.isfinite(lp)
        return jnp.where(ok, ll, -jnp.inf), jnp.where(ok, lp, -jnp.inf)

    v_logpost = jax.vmap(logpost_parts)

    k_init, k_run = jax.random.split(jnp.asarray(key))
    ll0, lp0 = v_logpost(q0, jax.random.split(k_init, n_chains))

    def step(carry, inp):
        q, ll, lp, scale, acc_sum, it = carry
        k_t = inp
        k_prop, k_ll, k_acc = jax.random.split(k_t, 3)

        prop = q + scale[:, None] * jax.random.normal(
            k_prop, (n_chains, dim), dtype)
        ll_p, lp_p = v_logpost(prop, jax.random.split(k_ll, n_chains))
        log_ratio = (ll_p + lp_p) - (ll + lp)
        u_acc = jnp.log(jax.random.uniform(k_acc, (n_chains,), dtype))
        accept = u_acc < log_ratio

        q_new = jnp.where(accept[:, None], prop, q)
        ll_new = jnp.where(accept, ll_p, ll)
        lp_new = jnp.where(accept, lp_p, lp)

        # Robbins-Monro scale adaptation during warmup only.  A NaN ratio
        # (both points at -inf) carries no information — treat it as
        # neutral so a chain stuck in a zero-likelihood region does not
        # shrink its proposal scale to zero.
        in_warmup = it < num_warmup
        alpha = jnp.minimum(jnp.exp(log_ratio), 1.0)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, target_accept)
        eta = 1.0 / jnp.sqrt(1.0 + it.astype(dtype))
        log_scale = jnp.log(scale) + jnp.where(
            in_warmup, eta * (alpha - target_accept), 0.0)
        scale_new = jnp.exp(log_scale)

        acc_sum_new = acc_sum + jnp.where(in_warmup, 0.0,
                                          accept.astype(dtype))
        return ((q_new, ll_new, lp_new, scale_new, acc_sum_new, it + 1),
                (q_new, ll_new))

    keys = jax.random.split(k_run, total)
    init = (q0, ll0, lp0,
            jnp.full((n_chains,), initial_scale, dtype),
            jnp.zeros((n_chains,), dtype), jnp.asarray(0))
    if segment_size is None or isinstance(q0, jax.core.Tracer):
        (q, ll, lp, scale, acc_sum, _), (qs, lls) = jax.lax.scan(
            step, init, keys)
    else:
        # the iteration counter lives in the carry, so slicing the key
        # stream reproduces the single-program run exactly
        seg_fn = jax.jit(lambda c, ks: jax.lax.scan(step, c, ks))
        carry, outs = init, []
        for lo in range(0, total, segment_size):
            carry, out = seg_fn(carry, keys[lo:min(lo + segment_size, total)])
            jax.block_until_ready(out)
            outs.append(out)
        (q, ll, lp, scale, acc_sum, _) = carry
        qs, lls = (jnp.concatenate(parts, axis=0) for parts in zip(*outs))

    samples = jnp.swapaxes(qs[num_warmup:], 0, 1)     # (chains, draws, dim)
    logliks = jnp.swapaxes(lls[num_warmup:], 0, 1)
    return PMMHResult(samples, logliks, acc_sum / num_samples, scale)
