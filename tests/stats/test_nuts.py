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


def _band_cov(dim, rho, scales):
    C = rho ** np.abs(np.subtract.outer(np.arange(dim), np.arange(dim)))
    return np.asarray(scales)[:, None] * C * np.asarray(scales)[None, :]


def test_dense_mass_recovers_full_covariance():
    """mass_matrix='dense' + pooled adaptation on a strongly correlated
    Gaussian: the adapted metric approximates the target covariance
    (including off-diagonals — a diagonal metric cannot represent them)
    and the samples reproduce the correlation structure."""
    dim = 5
    C = _band_cov(dim, 0.9, [2.0, 1.0, 0.5, 1.0, 2.0])
    Cinv = jnp.asarray(np.linalg.inv(C))

    def logp(q):
        return -0.5 * q @ (Cinv @ q)

    init = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (16, dim))
    res = sample_nuts(logp, init, jax.random.PRNGKey(1),
                      num_warmup=500, num_samples=500,
                      pooled=True, mass_matrix="dense")
    inv_mass = np.asarray(res.inv_mass)
    assert inv_mass.shape == (16, dim, dim)
    M = inv_mass[0]                      # pooled: identical across chains
    np.testing.assert_allclose(inv_mass[7], M, atol=1e-12)
    # adapted metric ~ target covariance, off-diagonals included
    corr_M = M / np.sqrt(np.outer(np.diag(M), np.diag(M)))
    corr_C = C / np.sqrt(np.outer(np.diag(C), np.diag(C)))
    np.testing.assert_allclose(corr_M, corr_C, atol=0.15)
    # samples reproduce the covariance
    flat = np.asarray(res.samples).reshape(-1, dim)
    np.testing.assert_allclose(np.cov(flat.T), C, atol=0.35 * C.max())
    assert np.asarray(res.diverging).mean() < 0.02


def test_dense_mass_beats_diag_on_correlation_ridge():
    """12-dim 0.99-equicorrelated Gaussian with a 100:1 scale spread: a
    diagonal metric can equalize the scales but not the correlation, so at
    a fixed draw budget the diag chains have not actually explored the
    ridge (their worst marginal std is ~50% off, whatever the
    autocorrelation-based ESS estimate claims), while the dense metric
    whitens the target and reproduces every marginal."""
    dim = 12
    corr = np.full((dim, dim), 0.99)
    np.fill_diagonal(corr, 1.0)
    scales = np.logspace(0, 2, dim)
    C = scales[:, None] * corr * scales[None, :]
    Cinv = jnp.asarray(np.linalg.inv(C))

    def logp(q):
        return -0.5 * q @ (Cinv @ q)

    init = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (8, dim))
    kw = dict(num_warmup=500, num_samples=400, pooled=True)
    res_diag = sample_nuts(logp, init, jax.random.PRNGKey(3),
                           mass_matrix="diag", **kw)
    res_dense = sample_nuts(logp, init, jax.random.PRNGKey(3),
                            mass_matrix="dense", **kw)

    def worst_marginal_std_relerr(res):
        flat = np.asarray(res.samples).reshape(-1, dim)
        return float(np.abs(flat.std(axis=0) / scales - 1).max())

    err_diag = worst_marginal_std_relerr(res_diag)
    err_dense = worst_marginal_std_relerr(res_dense)
    assert err_dense < 0.12, err_dense
    assert err_diag > 2.0 * err_dense, (err_diag, err_dense)
    assert float(np.asarray(res_dense.diverging).mean()) < 0.02


def test_dense_mass_unpooled_and_segmented():
    """Per-chain dense adaptation works, and segmented execution is
    bit-identical to the single-program run (same key streams)."""
    dim = 3
    C = _band_cov(dim, 0.8, [1.0, 0.5, 2.0])
    Cinv = jnp.asarray(np.linalg.inv(C))

    def logp(q):
        return -0.5 * q @ (Cinv @ q)

    init = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (4, dim))
    res_a = sample_nuts(logp, init, jax.random.PRNGKey(5), num_warmup=200,
                        num_samples=150, mass_matrix="dense")
    res_b = sample_nuts(logp, init, jax.random.PRNGKey(5), num_warmup=200,
                        num_samples=150, mass_matrix="dense",
                        segment_size=40)
    np.testing.assert_array_equal(np.asarray(res_a.samples),
                                  np.asarray(res_b.samples))
    assert res_a.inv_mass.shape == (4, dim, dim)
    # each chain's metric is PD
    for c in range(4):
        assert np.linalg.eigvalsh(np.asarray(res_a.inv_mass[c])).min() > 0


def test_dense_mass_pooled_over_mesh():
    """Dense metric + pooled adaptation sharded over the 8-device virtual
    mesh: runs, converges, and produces one shared PD metric."""
    from geconpy_tpu.parallel.mesh import make_mesh

    dim = 3
    C = _band_cov(dim, 0.9, [1.0, 1.0, 1.0])
    Cinv = jnp.asarray(np.linalg.inv(C))

    def logp(q):
        return -0.5 * q @ (Cinv @ q)

    init = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (16, dim))
    res = sample_nuts(logp, init, jax.random.PRNGKey(7), num_warmup=300,
                      num_samples=200, pooled=True, mass_matrix="dense",
                      mesh=make_mesh())
    assert np.asarray(res.diverging).mean() < 0.05
    M = np.asarray(res.inv_mass[0])
    assert np.linalg.eigvalsh(M).min() > 0
    corr_M = M / np.sqrt(np.outer(np.diag(M), np.diag(M)))
    assert corr_M[0, 1] > 0.5            # learned the correlation


def test_mass_matrix_validation():
    def logp(q):
        return -0.5 * jnp.sum(q**2)

    init = jnp.zeros((2, 2))
    with pytest.raises(ValueError, match="mass_matrix"):
        sample_nuts(logp, init, jax.random.PRNGKey(0), num_warmup=10,
                    num_samples=10, mass_matrix="banded")


def test_trajectories_reach_depth_on_high_dim_target():
    """Regression: the aligned-subtree U-turn check once OR-ed the criterion
    in both endpoint orders — a tautology (one of ±dq·p is negative for any
    non-orthogonal pair) that fired "turning" at the first depth-1 extension
    and silently capped EVERY trajectory at ~3 leapfrogs, costing ~7x ESS.
    On a 32-dim standard Gaussian the adapted step size is ~d^(-1/4), so a
    correct NUTS needs ~pi/eps ~ 6-16 leapfrogs before a genuine U-turn; the
    broken check could never exceed 3 on average."""
    dim = 32

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    init = jax.random.normal(jax.random.PRNGKey(3), (4, dim))
    res = sample_nuts(logp, init, jax.random.PRNGKey(4),
                      num_warmup=300, num_samples=300, max_depth=8)
    mean_lf = float(np.mean(np.asarray(res.n_leapfrog)))
    assert mean_lf > 4.5, mean_lf
    # and the deeper trees buy real mixing: dim-averaged ESS per draw on an
    # iid Gaussian should be near 1 (the broken sampler sat at ~0.15)
    samples = np.asarray(res.samples)
    ess = np.array([effective_sample_size(samples[:, :, i])
                    for i in range(dim)])
    assert ess.mean() > 0.5 * samples.shape[0] * samples.shape[1], ess.mean()


def test_dense_finalize_is_pd_under_frozen_chains():
    """A window whose chains never moved yields a zero sample covariance;
    the finalized dense metric must still be PD (Cholesky finite) — a
    singular metric NaNs every pooled chain's momenta and the run locks
    into 100% divergence (observed on SW-2007 full-block, seed-dependent)."""
    from geconpy_tpu.stats.nuts import (_adapt_init, _welford_finalize,
                                        _welford_update_batch)

    dim, chains = 6, 8
    for dtype in (jnp.float32, jnp.float64):
        adapt = _adapt_init(0.1, dim, dtype, dense=True)
        q_frozen = jnp.ones((chains, dim), dtype)      # identical positions
        for _ in range(7):
            adapt = _welford_update_batch(adapt, q_frozen)
        out = _welford_finalize(adapt)
        L = jnp.linalg.cholesky(out.inv_mass)
        assert bool(jnp.all(jnp.isfinite(L))), dtype

        # a NaN-poisoned estimate falls back to the anchor, not NaN
        adapt_bad = adapt._replace(
            welford_m2=adapt.welford_m2.at[0, 0].set(jnp.nan))
        out_bad = _welford_finalize(adapt_bad)
        assert bool(jnp.all(jnp.isfinite(out_bad.inv_mass))), dtype
        L = jnp.linalg.cholesky(out_bad.inv_mass)
        assert bool(jnp.all(jnp.isfinite(L))), dtype


def test_dense_kernel_survives_singular_metric():
    """nuts_kernel with a singular dense inv_mass must degrade to the
    diagonal metric for the transition — finite position and acceptance,
    never NaN momenta."""
    from geconpy_tpu.stats.nuts import nuts_kernel

    def logp(q):
        return -0.5 * jnp.sum(q ** 2)

    dim = 4
    q = jnp.zeros((dim,))
    lp, g = jax.value_and_grad(logp)(q)
    # rank-1 (singular) covariance with nonzero diagonal
    v = jnp.arange(1.0, dim + 1.0)
    inv_mass = jnp.outer(v, v)
    q2, lp2, g2, info = nuts_kernel(logp, q, lp, g, jax.random.PRNGKey(0),
                                    0.25, inv_mass, max_depth=5)
    assert bool(jnp.all(jnp.isfinite(q2)))
    assert bool(jnp.isfinite(lp2))
    assert bool(jnp.isfinite(info["accept_prob"]))
    assert float(info["accept_prob"]) > 0.0
