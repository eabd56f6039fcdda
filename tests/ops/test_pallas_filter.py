"""Fused constant-gain filter tail: Pallas kernel vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.ops.pallas_filter import pallas_filter_tail, reference_filter_tail


def make_batch(B=20, n=6, k=3, T=40, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(B, n, n)) * 0.2
    TK = rng.normal(size=(B, n, k)) * 0.3
    Z = rng.normal(size=(B, k, n))
    d = rng.normal(size=(B, k)) * 0.1
    F0 = rng.normal(size=(B, k, k))
    Finv = np.einsum("bij,bkj->bik", F0, F0) + 3 * np.eye(k)
    const = rng.normal(size=B)
    x0 = rng.normal(size=(B, n))
    y = rng.normal(size=(T, k))
    return tuple(jnp.asarray(a) for a in (y, M, TK, Z, d, Finv, const, x0))


@pytest.mark.parametrize("B,tile", [(20, 128), (130, 128), (7, 128)])
def test_pallas_matches_reference(B, tile):
    y, M, TK, Z, d, Finv, const, x0 = make_batch(B=B)
    ref = reference_filter_tail(y, M, TK, Z, d, Finv, const, x0)
    pal = pallas_filter_tail(y, M, TK, Z, d, Finv, const, x0, tile=tile,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), rtol=1e-10)


def test_batched_loglik_matches_per_draw():
    import pathlib

    from geconpy_tpu import model_from_gcn
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    data_dir = pathlib.Path(__file__).parents[2] / "geconpy_tpu" / "data"
    model = model_from_gcn(str(data_dir / "rbc_estimation.gcn"))
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], constant_params=["alpha", "sigma_C"],
                 filter_type="steady_state", kalman_settle=32)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=150)
    u0 = ss.unconstrain(draw)
    U = u0[None, :] + 0.03 * jax.random.normal(
        jax.random.PRNGKey(1), (12, u0.shape[0]))
    ref = jax.vmap(ss.build_logpost(data))(U)
    bat = ss.build_batched_loglik(data, n_settle=32, interpret=True)(U)
    np.testing.assert_allclose(np.asarray(bat), np.asarray(ref), rtol=1e-10)

    # NaN data rejected
    bad = np.asarray(data).copy()
    bad[0, 0] = np.nan
    with pytest.raises(ValueError, match="fully observed"):
        ss.build_batched_loglik(bad)
