import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.stats.diagnostics import (
    effective_sample_size,
    split_rhat,
    summarize_chains,
)
from geconpy_tpu.stats.nuts import sample_nuts


def test_nuts_standard_normal():
    dim = 4

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    key = jax.random.PRNGKey(0)
    init = jax.random.normal(key, (4, dim))
    res = sample_nuts(logp, init, jax.random.PRNGKey(1),
                      num_warmup=400, num_samples=600)
    samples = np.asarray(res.samples)  # (4, 600, 4)
    assert samples.shape == (4, 600, dim)
    flat = samples.reshape(-1, dim)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.1)
    np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=0.12)
    assert np.asarray(res.diverging).mean() < 0.02
    for i in range(dim):
        assert split_rhat(samples[:, :, i]) < 1.05


def test_nuts_correlated_gaussian():
    """Anisotropic target: mass adaptation must cope with scale 100:1."""
    scales = jnp.array([10.0, 0.1, 1.0])

    def logp(q):
        return -0.5 * jnp.sum((q / scales) ** 2)

    init = jnp.ones((4, 3))
    res = sample_nuts(logp, init, jax.random.PRNGKey(2),
                      num_warmup=600, num_samples=800)
    samples = np.asarray(res.samples)
    flat = samples.reshape(-1, 3)
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(scales), rtol=0.15)
    # adapted inverse mass should reflect the marginal variances
    inv_mass = np.asarray(res.inv_mass)
    assert inv_mass[:, 0].mean() > 10 * inv_mass[:, 1].mean()


def test_nuts_constrained_target_via_transform():
    """Half-line-constrained target sampled in unconstrained space (the way
    the statespace layer uses NUTS: prior bijectors map support -> R^d)."""

    def logp_u(u):
        q = jnp.exp(u)
        return -0.5 * jnp.sum((q - 1.0) ** 2) + jnp.sum(u)  # + log-jacobian

    init = jnp.zeros((4, 2))
    res = sample_nuts(logp_u, init, jax.random.PRNGKey(3),
                      num_warmup=400, num_samples=600)
    q = np.exp(np.asarray(res.samples).reshape(-1, 2))
    # truncated normal TN(1, 1, lower=0) has mean 1.288
    np.testing.assert_allclose(q.mean(axis=0), 1.288, atol=0.15)
    assert np.asarray(res.diverging).mean() < 0.02


def test_nuts_hard_neg_inf_regions_safe():
    """Hard -inf regions (solver-failure gating) must never crash or let the
    chain escape the support."""

    def logp(q):
        val = -0.5 * jnp.sum((q - 1.0) ** 2)
        return jnp.where(jnp.all(q > 0), val, -jnp.inf)

    init = jnp.full((2, 2), 1.0)
    res = sample_nuts(logp, init, jax.random.PRNGKey(3),
                      num_warmup=200, num_samples=300)
    samples = np.asarray(res.samples)
    assert np.isfinite(samples).all()
    assert (samples > 0).all()
    assert np.isfinite(np.asarray(res.logp)).all()


def test_diagnostics_sane():
    rng = np.random.default_rng(0)
    good = rng.normal(size=(4, 1000))
    assert split_rhat(good) < 1.01
    ess = effective_sample_size(good)
    assert ess > 2000  # iid draws

    # stuck chain inflates R-hat
    bad = good.copy()
    bad[0] += 10.0
    assert split_rhat(bad) > 1.5

    # strongly autocorrelated chain deflates ESS
    ar = np.zeros((2, 2000))
    eps = rng.normal(size=(2, 2000))
    for t in range(1, 2000):
        ar[:, t] = 0.95 * ar[:, t - 1] + eps[:, t]
    assert effective_sample_size(ar) < 600


def test_summarize():
    rng = np.random.default_rng(1)
    samples = rng.normal(size=(4, 500, 2))
    df = summarize_chains(samples, names=["a", "b"])
    assert list(df.index) == ["a", "b"]
    assert (df["r_hat"] < 1.05).all()


def test_pooled_adaptation_gaussian():
    """Pooled cross-chain warmup: shared step size + mass matrix, accurate
    moments on a correlated anisotropic Gaussian."""
    cov = np.array([[4.0, 0.9], [0.9, 0.25]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ prec @ q

    q0 = jax.random.normal(jax.random.PRNGKey(0), (16, 2))
    res = jax.jit(lambda: sample_nuts(
        logp, q0, jax.random.PRNGKey(1), num_warmup=300, num_samples=800,
        pooled=True))()
    s = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [0.0, 0.0], atol=0.3)
    np.testing.assert_allclose(s.var(0), [4.0, 0.25], rtol=0.25)
    # adaptation state is shared across chains
    assert np.unique(np.asarray(res.step_size)).size == 1
    assert np.unique(np.asarray(res.inv_mass[:, 0])).size == 1
    # mass matrix approximates the marginal variances
    np.testing.assert_allclose(np.asarray(res.inv_mass[0]), [4.0, 0.25],
                               rtol=0.5)


def test_pooled_adaptation_over_mesh():
    """axis_name pools the Welford statistics across a shard_map mesh: all
    devices converge to the same adaptation state via psum/pmean."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multiple devices")
    n_dev = len(jax.devices())
    prec = jnp.asarray(np.linalg.inv(np.array([[4.0, 0.9], [0.9, 0.25]])))

    def logp(q):
        return -0.5 * q @ prec @ q

    mesh = Mesh(np.array(jax.devices()), ("chains",))
    q0 = jax.random.normal(jax.random.PRNGKey(0), (2 * n_dev, 2))
    keys = jax.random.split(jax.random.PRNGKey(1), n_dev)

    def per_device(q0_local, key_local):
        return sample_nuts(logp, q0_local, key_local[0], num_warmup=200,
                           num_samples=200, pooled=True, axis_name="chains")

    f = jax.jit(shard_map(per_device, mesh=mesh,
                          in_specs=(P("chains"), P("chains")),
                          out_specs=P("chains")))
    res = f(q0, keys)
    # identical pooled state on every device
    assert np.unique(np.asarray(res.step_size)).size == 1
    assert np.unique(np.asarray(res.inv_mass[:, 0])).size == 1
    s = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(s.var(0), [4.0, 0.25], rtol=0.4)


def test_scale_disparate_target_needs_curvature_mass():
    """Parameter scales spanning 1e-3..1: windowed adaptation alone cannot
    escape its mass-feedback loop (each window re-measures last window's
    random-walk distance), but curvature seeding (mass_init='hessian')
    makes the target easy.  This is the DSGE regime — persistences O(1),
    shock standard deviations O(1e-2)."""
    import jax.numpy as jnp

    from geconpy_tpu.stats.nuts import sample_nuts

    sds = jnp.array([1e-3, 1e-2, 1e-1, 1.0])

    def logpost(u):
        return -0.5 * jnp.sum((u / sds) ** 2)

    inits = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (4, 4))
    res = sample_nuts(logpost, inits, jax.random.PRNGKey(1), num_warmup=400,
                      num_samples=300, max_depth=8, mass_init="hessian")
    s = np.asarray(res.samples)
    for i in range(4):
        assert split_rhat(s[:, :, i]) < 1.05, i
        assert effective_sample_size(s[:, :, i]) > 100, i
    # the sample reproduces every marginal scale
    emp = s.reshape(-1, 4).std(axis=0)
    np.testing.assert_allclose(emp, np.asarray(sds), rtol=0.25)


def test_segmented_matches_single_program():
    """segment_size pre-splits the same key streams, so segmented execution
    reproduces the single-program result exactly (both variants)."""
    import jax.numpy as jnp

    dim = 3
    cov = np.array([[1.0, 0.5, 0.0], [0.5, 2.0, 0.3], [0.0, 0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def logp(q):
        return -0.5 * q @ prec @ q

    init = jnp.asarray(np.random.default_rng(0).normal(size=(4, dim)))
    kwargs = dict(num_warmup=120, num_samples=90, max_depth=6)

    for pooled in (False, True):
        base = sample_nuts(logp, init, jax.random.PRNGKey(7),
                           pooled=pooled, **kwargs)
        seg = sample_nuts(logp, init, jax.random.PRNGKey(7),
                          pooled=pooled, segment_size=40, **kwargs)
        np.testing.assert_allclose(np.asarray(seg.samples),
                                   np.asarray(base.samples), atol=1e-10)
        np.testing.assert_allclose(np.asarray(seg.step_size),
                                   np.asarray(base.step_size), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(seg.diverging),
                                   np.asarray(base.diverging))
