import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"


@pytest.fixture(scope="module")
def ss_mod():
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"))
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"],
                 measurement_error=["Y", "C"])
    return ss


@pytest.fixture(scope="module")
def dataset(ss_mod):
    data, draw = ss_mod.data_from_prior(jax.random.PRNGKey(7), periods=150)
    return data, draw


def test_configure(ss_mod):
    labels = ss_mod.param_labels
    # model params with priors + 2 measurement errors
    assert set(labels) == {"alpha", "rho_A", "sigma_A", "sigma_C",
                           "sigma_obs_Y", "sigma_obs_C"}
    assert ss_mod.n_estimated == 6


def test_stochastic_singularity_check():
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"))
    ss = DSGEStateSpace(model)
    with pytest.raises(ValueError, match="singular"):
        ss.configure(observed_states=["Y", "C"])  # 2 obs, 1 shock, no ME


def test_bad_observable_rejected(ss_mod):
    model = ss_mod.model
    with pytest.raises(ValueError, match="observed_states"):
        DSGEStateSpace(model).configure(observed_states=["NOPE"])


def test_logpost_finite_at_truth(ss_mod, dataset):
    data, draw = dataset
    extras_fn = jax.jit(ss_mod.build_logpost_extras(data))
    u = ss_mod.unconstrain(draw)
    ex = extras_fn(u)
    assert np.isfinite(float(ex.logpost)), ex
    assert bool(ex.ss_success) and bool(ex.solver_success)
    assert float(ex.deterministic_norm) < 1e-6
    assert float(ex.spectral_radius) < 1.0


def test_logpost_gradient_finite(ss_mod, dataset):
    data, draw = dataset
    logpost = ss_mod.build_logpost(data)
    u = ss_mod.unconstrain(draw)
    g = jax.jit(jax.grad(logpost))(u)
    assert np.all(np.isfinite(np.asarray(g))), g


def test_logpost_gradient_matches_fd(ss_mod, dataset):
    data, draw = dataset
    logpost = jax.jit(ss_mod.build_logpost(data))
    u = ss_mod.unconstrain(draw)
    g = np.asarray(jax.grad(logpost)(u))
    eps = 1e-6
    for i in range(len(u)):
        up = u.at[i].add(eps)
        um = u.at[i].add(-eps)
        fd = (float(logpost(up)) - float(logpost(um))) / (2 * eps)
        assert abs(g[i] - fd) < 1e-3 * max(1.0, abs(fd)), \
            f"param {ss_mod.param_labels[i]}: {g[i]} vs {fd}"


def test_logpost_vmap(ss_mod, dataset):
    data, draw = dataset
    logpost = ss_mod.build_logpost(data)
    u0 = ss_mod.unconstrain(draw)
    batch = jnp.stack([u0, u0 * 1.01, u0 * 0.99, u0 + 0.3])
    lls = jax.jit(jax.vmap(logpost))(batch)
    assert lls.shape == (4,)
    assert np.isfinite(np.asarray(lls)).all()


def test_likelihood_peaks_near_truth(ss_mod, dataset):
    """The loglik at the data-generating parameters beats distorted ones."""
    data, draw = dataset
    extras_fn = jax.jit(ss_mod.build_logpost_extras(data))
    u_true = ss_mod.unconstrain(draw)
    ll_true = float(extras_fn(u_true).loglik)
    rng = np.random.default_rng(0)
    worse = 0
    for _ in range(8):
        u_off = u_true + jnp.asarray(rng.normal(size=u_true.shape))
        ll_off = float(extras_fn(u_off).loglik)
        if ll_off < ll_true:
            worse += 1
    assert worse >= 6  # most random distortions reduce the likelihood


def test_prior_sampling(ss_mod):
    draws = ss_mod.sample_prior(jax.random.PRNGKey(0), n_draws=500)
    assert set(draws) == set(ss_mod.param_labels)
    assert 0.2 < draws["alpha"].mean() < 0.6
    assert (draws["sigma_A"] > 0).all()


def test_gensys_solver_in_statespace(ss_mod, dataset):
    """solver='gensys' (device disk-split) gives the same likelihood as
    cycle reduction."""
    data, draw = dataset
    model = ss_mod.model
    ss_g = DSGEStateSpace(model)
    ss_g.configure(observed_states=["Y", "C"],
                   measurement_error=["Y", "C"],
                   solver="gensys")
    u = ss_mod.unconstrain(draw)
    ll_cr = float(jax.jit(ss_mod.build_logpost(data))(u))
    ll_gs = float(jax.jit(ss_g.build_logpost(data))(u))
    np.testing.assert_allclose(ll_gs, ll_cr, rtol=1e-7)


def test_filter_core_reduction_parity():
    """When all observables are dynamic, the filter runs on the dynamic
    core; the likelihood must equal the full-state filter exactly."""
    from geconpy_tpu import get_example_gcn, model_from_gcn

    model = model_from_gcn(get_example_gcn("sw2007"), verbose=False)
    estimated = ["crhoa", "sigma_ea", "crr"]
    constant = [p for p in model.param_names if p not in estimated]
    kwargs = dict(observed_states=["y", "pinf", "r"], constant_params=constant)
    ss_c = DSGEStateSpace(model).configure(**kwargs)
    assert len(ss_c._filter_core) < model.n_variables  # reduction active
    data, draw = ss_c.data_from_prior(jax.random.PRNGKey(0), periods=80)
    u = ss_c.unconstrain(draw)
    ll_core = float(jax.jit(ss_c.build_logpost_extras(data))(u).loglik)

    # full-state solution fn through the same Kalman kernel
    from geconpy_tpu.ops.kalman import kalman_filter as _kf

    sol = jax.jit(ss_c.build_solution_fn(full_state=True))(u)
    ll_full = float(_kf(jnp.asarray(data), sol["T_aug"], sol["R_aug"],
                        sol["Q"], sol["Z"], sol["H"], d=sol["d"]).loglik)
    np.testing.assert_allclose(ll_core, ll_full, rtol=1e-9)


def test_batched_pallas_policy_parity():
    """build_batched_loglik(policy='pallas') — vmapped pre/post around the
    lane-batched Pallas cycle-reduction kernel — must reproduce the standard
    vmapped logpost exactly (interpret mode on CPU)."""
    from geconpy_tpu import get_example_gcn, model_from_gcn

    model = model_from_gcn(get_example_gcn("sw2007"), verbose=False)
    estimated = ["crhoa", "sigma_ea", "crr", "crpi", "chabb"]
    constant = [p for p in model.param_names if p not in estimated]
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["y", "pinf", "r"],
                 filter_type="steady_state", kalman_settle=16,
                 constant_params=constant)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=80)
    u0 = ss.unconstrain(draw)
    U = u0[None] + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                            (8, len(u0)))
    f_pal = jax.jit(ss.build_batched_loglik(np.asarray(data), n_settle=16,
                                            policy="pallas", cr_tile=8,
                                            interpret=True))
    lp_ref = jax.jit(jax.vmap(ss.build_logpost(np.asarray(data))))
    ll_p = np.asarray(f_pal(U))
    ll_r = np.asarray(lp_ref(U))
    both = np.isfinite(ll_p) & np.isfinite(ll_r)
    assert both.sum() >= 6
    np.testing.assert_allclose(ll_p[both], ll_r[both], rtol=1e-8)


def test_batched_pallas_path_rbc():
    """The fused Pallas policy+settle sweep path also reproduces the
    standard logpost on a small model (exercises the static
    back-substitution of both T and R)."""
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"))
    ss = DSGEStateSpace(model).configure(
        observed_states=["Y", "C"], measurement_error=["Y", "C"],
        filter_type="steady_state", kalman_settle=16)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=60)
    u0 = ss.unconstrain(draw)
    U = u0[None] + 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                           (8, len(u0)))
    f_pal = jax.jit(ss.build_batched_loglik(
        np.asarray(data), n_settle=16, policy="pallas", settle="pallas",
        cr_tile=8, interpret=True))
    lp_ref = jax.jit(jax.vmap(ss.build_logpost(np.asarray(data))))
    ll_p, ll_r = np.asarray(f_pal(U)), np.asarray(lp_ref(U))
    both = np.isfinite(ll_p) & np.isfinite(ll_r)
    assert both.sum() >= 6
    np.testing.assert_allclose(ll_p[both], ll_r[both], rtol=1e-9)


def test_data_from_prior_pct_missing(ss_mod):
    """pct_missing NaNs out the requested fraction of cells (reference
    parity: gEconpy/model/statespace.py:1324 data_from_prior) and the
    missing-data filter still produces a finite likelihood."""
    data, draw = ss_mod.data_from_prior(jax.random.PRNGKey(11), periods=200,
                                        pct_missing=0.25)
    frac = float(np.isnan(data).mean())
    assert 0.15 < frac < 0.35, frac

    logpost = jax.jit(ss_mod.build_logpost(np.asarray(data)))
    lp = float(logpost(ss_mod.unconstrain(draw)))
    assert np.isfinite(lp)

    with pytest.raises(ValueError, match="pct_missing"):
        ss_mod.data_from_prior(jax.random.PRNGKey(0), pct_missing=1.5)
