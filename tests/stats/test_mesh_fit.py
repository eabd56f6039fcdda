"""Mesh-native ``fit(mesh=...)``: sharded chain blocks over a device mesh.

The conftest forces 8 virtual CPU devices, so these exercise the real
shard_map path (the reference's multi-process ``pm.sample(chains=...)``
story, re-designed TPU-native — reference gEconpy/model/statespace.py:833).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

import geconpy_tpu
from geconpy_tpu.stats.statespace import DSGEStateSpace


@pytest.fixture(scope="module")
def ss_and_data():
    model = geconpy_tpu.model_from_gcn(
        geconpy_tpu.get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], constant_params=["alpha", "sigma_C"])
    data, _ = ss.data_from_prior(jax.random.PRNGKey(0), periods=16)
    return ss, np.asarray(data, dtype=np.float64)


def _mesh(n=None):
    devices = jax.devices()
    n = n or len(devices)
    return Mesh(np.array(devices[:n]), ("chains",))


FIT_KW = dict(num_warmup=12, num_samples=6, seed=3, max_depth=4)


def test_sharded_unpooled_matches_single_device(ss_and_data):
    """Unpooled chains are fully independent and chain keys are split on
    the host either way, so sharding the chain axis over 8 devices
    reproduces the single-device result up to XLA batching round-off
    (batch-8 vs batch-1 codegen differs in the last ulp; measured max
    deviation ~1e-12 on this model — documented tolerance, not bitwise)."""
    ss, data = ss_and_data
    base = geconpy_tpu.fit(ss, data, num_chains=8, **FIT_KW)
    sharded = geconpy_tpu.fit(ss, data, num_chains=8, mesh=_mesh(), **FIT_KW)
    np.testing.assert_allclose(sharded.unconstrained, base.unconstrained,
                               atol=1e-8)
    np.testing.assert_allclose(sharded.logp, base.logp, atol=1e-7)
    np.testing.assert_array_equal(sharded.diverging, base.diverging)
    np.testing.assert_allclose(sharded.step_size, base.step_size, rtol=1e-10)


def test_sharded_pooled_adaptation(ss_and_data):
    """Pooled warmup over the mesh: Welford psums + pmean acceptance give
    ONE adaptation state shared by every device's chains."""
    ss, data = ss_and_data
    res = geconpy_tpu.fit(ss, data, num_chains=16, mesh=_mesh(),
                          pooled_adaptation=True, num_warmup=16,
                          num_samples=6, seed=1, max_depth=4)
    assert res.unconstrained.shape[0] == 16
    assert np.isfinite(res.logp).all()
    assert np.unique(res.step_size).size == 1
    assert np.unique(res.accept_prob).size > 1       # chains actually moved


def test_sharded_pooled_matches_single_device_stats(ss_and_data):
    """Pooled mesh vs pooled single-device differ only in psum reduction
    order; the adapted step size must agree closely."""
    ss, data = ss_and_data
    kw = dict(num_chains=8, pooled_adaptation=True, num_warmup=24,
              num_samples=8, seed=2, max_depth=4)
    base = geconpy_tpu.fit(ss, data, **kw)
    sharded = geconpy_tpu.fit(ss, data, mesh=_mesh(), **kw)
    np.testing.assert_allclose(sharded.step_size, base.step_size, rtol=1e-6)
    np.testing.assert_allclose(sharded.unconstrained, base.unconstrained,
                               atol=1e-5)


def test_mesh_with_segments_matches_unsegmented(ss_and_data):
    """segment_size composes with mesh: pre-split key streams make the
    bounded-program execution reproduce the one-program result."""
    ss, data = ss_and_data
    kw = dict(num_chains=8, mesh=_mesh(), **FIT_KW)
    base = geconpy_tpu.fit(ss, data, **kw)
    seg = geconpy_tpu.fit(ss, data, segment_size=5, **kw)
    np.testing.assert_allclose(seg.unconstrained, base.unconstrained,
                               atol=1e-10)


def test_chains_must_divide_mesh(ss_and_data):
    ss, data = ss_and_data
    with pytest.raises(ValueError, match="divisible"):
        geconpy_tpu.fit(ss, data, num_chains=6, mesh=_mesh(4), **FIT_KW)


def test_repeat_fit_reuses_sampler_programs(ss_and_data):
    """The builder + sampler caches make a repeat fit with identical
    (data, config) reuse the same compiled programs: same logpost object,
    no new sampler cache entry, and identical draws."""
    from geconpy_tpu.stats import nuts

    ss, data = ss_and_data
    assert ss.build_logpost(data) is ss.build_logpost(data)

    r1 = geconpy_tpu.fit(ss, data, num_chains=4, **FIT_KW)
    n_entries = len(nuts._SAMPLER_CACHE)
    r2 = geconpy_tpu.fit(ss, data, num_chains=4, **FIT_KW)
    assert len(nuts._SAMPLER_CACHE) == n_entries
    np.testing.assert_array_equal(r1.unconstrained, r2.unconstrained)
