import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu import model_from_gcn
from geconpy_tpu.parallel.mesh import make_mesh, pvmap, shard_batch, sharded_prior_sweep

DATA = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data" \
    if len(pathlib.Path(__file__).parents) > 2 else None
DATA = pathlib.Path(__file__).parents[1] / "geconpy_tpu" / "data"


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_pvmap_matches_vmap():
    mesh = make_mesh()

    def f(x):
        return jnp.sum(x**2), x * 2

    xs = jnp.arange(32.0).reshape(16, 2)
    got = pvmap(f, mesh)(shard_batch(xs, mesh))
    want = jax.vmap(f)(xs)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]))


def test_sharded_prior_solvability_sweep():
    """TPU-native version of the multiprocessing solvability sweep: per-draw
    solve with success flags, draws sharded over 8 devices."""
    model = model_from_gcn(str(DATA / "rbc.gcn"))
    mf = model.functions
    linearize = model.linearizer(True)

    from geconpy_tpu.ops.cycle_reduction import solve_policy_cycle_reduction

    def per_draw(theta):
        sol = model.ss_solver(theta)
        lin = linearize(sol.x_ss, sol.theta_full)
        T, R, ok, *_ = solve_policy_cycle_reduction(lin.A, lin.B, lin.C, lin.D)
        return sol.success & ok

    theta0 = model.default_theta()
    rng = np.random.default_rng(0)
    # 13 draws (not divisible by 8 -> exercises padding); small jitter keeps
    # draws in the valid region
    draws = jnp.asarray(theta0)[None, :] * (
        1.0 + 0.005 * jnp.asarray(rng.normal(size=(13, theta0.shape[0]))))
    # one deliberately invalid draw: beta > 1 breaks the steady state; the
    # sweep must flag it rather than crash (failure-as-flags contract)
    beta_idx = [p.name for p in mf.free_params].index("beta")
    draws = jnp.concatenate([draws, draws[-1:].at[0, beta_idx].set(1.05)])
    mesh = make_mesh()
    ok = sharded_prior_sweep(per_draw, draws, mesh)
    assert ok.shape == (14,)
    assert bool(jnp.all(ok[:13]))
    assert not bool(ok[13])


def test_sharded_second_order_logpost():
    """Second-order (UKF) log posteriors shard over the 8-device mesh the
    same way the linear path does: chains/draws data-parallel, per-draw
    -inf gating intact under shard_map."""
    import pathlib

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    DATA = pathlib.Path(__file__).parents[1] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(DATA / "rbc_estimation.gcn"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], measurement_error=["Y"],
                 constant_params=["alpha", "sigma_C"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(9), periods=40)
    logpost = ss.build_logpost_second_order(data)

    mesh = make_mesh(8)
    u0 = ss.initial_position()
    us = u0[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (8, len(u0)))
    # one deliberately hopeless draw must gate to -inf, not poison the batch
    us = us.at[3].set(jnp.full((len(u0),), 40.0))

    vals = pvmap(logpost, mesh)(shard_batch(us, mesh))
    vals = np.asarray(vals)
    ref = np.asarray(jax.vmap(logpost)(us))
    np.testing.assert_allclose(vals, ref, rtol=1e-6)
    assert np.isfinite(vals[:3]).all() and np.isfinite(vals[4:]).all()
    assert not np.isnan(vals[3])
