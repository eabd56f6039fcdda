"""PMMH sampler tests.

Exactness oracle: with a deterministic likelihood PMMH is plain adaptive
random-walk Metropolis, so a standard-normal target must be recovered.  The
pseudo-marginal property is pinned by replacing the likelihood with an
UNBIASED noisy estimate (log-normal, mean-corrected): the invariant
distribution must not move (Andrieu-Roberts 2009).
"""

import jax
import jax.numpy as jnp
import numpy as np

from geconpy_tpu.stats.pmmh import sample_pmmh


def _run(loglik_fn, num_samples=4000, chains=8, seed=0):
    dim = 1
    q0 = jax.random.normal(jax.random.PRNGKey(seed + 100), (chains, dim))
    res = sample_pmmh(loglik_fn, lambda u: jnp.asarray(0.0),
                      q0, jax.random.PRNGKey(seed), num_warmup=1000,
                      num_samples=num_samples, initial_scale=0.5)
    return res


def test_pmmh_recovers_standard_normal():
    def loglik(u, key):
        return -0.5 * jnp.sum(u**2), jnp.asarray(True)

    res = _run(loglik)
    draws = np.asarray(res.samples).reshape(-1)
    assert abs(draws.mean()) < 0.05
    np.testing.assert_allclose(draws.std(), 1.0, rtol=0.06)
    acc = np.asarray(res.accept_rate)
    assert np.all(acc > 0.1) and np.all(acc < 0.6)


def test_pmmh_pseudo_marginal_invariance():
    """Noisy-but-unbiased likelihood estimates leave the target invariant:
    exp(noise) has mean one when noise ~ N(-s^2/2, s^2)."""
    s = 0.7

    def noisy_loglik(u, key):
        noise = s * jax.random.normal(key, ()) - 0.5 * s * s
        return -0.5 * jnp.sum(u**2) + noise, jnp.asarray(True)

    res = _run(noisy_loglik, num_samples=8000, seed=3)
    draws = np.asarray(res.samples).reshape(-1)
    assert abs(draws.mean()) < 0.06
    np.testing.assert_allclose(draws.std(), 1.0, rtol=0.08)


def test_pmmh_gates_failed_estimates():
    """success=False proposals must be rejected (not crash / not accepted):
    chains started at finite-posterior points never visit the failure
    region."""
    def loglik(u, key):
        ok = jnp.all(jnp.abs(u) < 1.0)     # fail outside the unit box
        return -0.5 * jnp.sum(u**2), ok

    q0 = 0.5 * jax.random.uniform(jax.random.PRNGKey(42), (8, 1),
                                  minval=-1.0, maxval=1.0)
    res = sample_pmmh(loglik, lambda u: jnp.asarray(0.0), q0,
                      jax.random.PRNGKey(5), num_warmup=500,
                      num_samples=2000, initial_scale=0.5)
    draws = np.asarray(res.samples).reshape(-1)
    assert np.all(np.abs(draws) < 1.0)


def test_pmmh_second_order_smoke():
    """End-to-end: PMMH over the particle-filter likelihood of the pruned
    second-order RBC (tiny run — plumbing, acceptance, finiteness)."""
    import pathlib

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], measurement_error=["Y"],
                 constant_params=["alpha", "sigma_C", "sigma_A"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(2), periods=40)

    pf = ss.build_pf_loglik_second_order(data, n_particles=512)

    def logprior(u):
        lp = jnp.asarray(0.0)
        for i, p in enumerate(ss.estimated):
            x, logjac = p.prior.from_unconstrained(u[i])
            lp = lp + p.prior.logpdf(x) + logjac
        return lp

    q0 = jnp.tile(ss.initial_position()[None, :], (2, 1))
    res = sample_pmmh(pf, logprior, q0, jax.random.PRNGKey(0),
                      num_warmup=40, num_samples=60, initial_scale=0.1)
    assert np.isfinite(np.asarray(res.samples)).all()
    assert np.isfinite(np.asarray(res.loglik)).all()
    assert float(np.asarray(res.accept_rate).mean()) > 0.0


def test_fit_pmmh_wrapper_smoke():
    """fit_pmmh returns a standard PosteriorResult (constrained samples,
    summary machinery) from the second-order PF posterior."""
    import pathlib

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.estimation import fit_pmmh
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], measurement_error=["Y"],
                 constant_params=["alpha", "sigma_C", "sigma_A"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(4), periods=40)

    res = fit_pmmh(ss, data, num_chains=2, num_warmup=30, num_samples=40,
                   n_particles=256, seed=2)
    assert res.samples.shape == (2, 40, ss.n_estimated)
    assert np.isfinite(res.samples).all()
    assert np.isfinite(res.logp).all()
    df = res.summary()
    assert set(df.index) == set(ss.param_labels)


def test_pmmh_segmented_matches_single_program():
    import jax
    import jax.numpy as jnp

    from geconpy_tpu.stats.pmmh import sample_pmmh

    def loglik(u, key):
        return -0.5 * jnp.sum(u ** 2), jnp.asarray(True)

    def logprior(u):
        return -0.5 * jnp.sum((u / 3.0) ** 2)

    init = jnp.asarray(np.random.default_rng(1).normal(size=(3, 2)))
    kwargs = dict(num_warmup=60, num_samples=80)
    base = sample_pmmh(loglik, logprior, init, jax.random.PRNGKey(5), **kwargs)
    seg = sample_pmmh(loglik, logprior, init, jax.random.PRNGKey(5),
                      segment_size=33, **kwargs)
    np.testing.assert_allclose(np.asarray(seg.samples),
                               np.asarray(base.samples), atol=1e-12)
    np.testing.assert_allclose(np.asarray(seg.scale),
                               np.asarray(base.scale), rtol=1e-12)
