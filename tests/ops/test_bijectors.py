"""Constrained-variable bijector unit tests (ops/bijectors.py).

Reference role: PyMC-transform reparameterization at gEconpy/model/model.py:70,105.
"""

import jax.numpy as jnp
import numpy as np

from geconpy_tpu.ops.bijectors import (
    IDENTITY,
    LOG,
    NEG_LOG,
    VectorBijector,
    make_bijector,
)


def test_make_bijector_codes():
    bij = make_bijector([
        {"positive": True},
        {"negative": True},
        {"real": True},
        {},
    ])
    assert list(np.asarray(bij.kinds)) == [LOG, NEG_LOG, IDENTITY, IDENTITY]


def test_forward_inverse_roundtrip():
    bij = make_bijector([{"positive": True}, {"negative": True}, {}])
    x = jnp.array([2.5, -0.7, 3.0])
    u = bij.inverse(x)
    np.testing.assert_allclose(np.asarray(bij.forward(u)), np.asarray(x), rtol=1e-12)


def test_forward_respects_signs():
    bij = make_bijector([{"positive": True}, {"negative": True}, {}])
    u = jnp.array([-40.0, -40.0, -40.0])
    x = np.asarray(bij.forward(u))
    assert x[0] > 0
    assert x[1] < 0
    assert x[2] == -40.0


def test_inverse_guards_domain_violations():
    # inverse of a non-positive value under LOG must stay finite (clamped)
    bij = VectorBijector(jnp.array([LOG]))
    u = bij.inverse(jnp.array([0.0]))
    assert np.isfinite(np.asarray(u)).all()


def test_identity_is_noop():
    bij = make_bijector([{}, {"real": True}])
    x = jnp.array([-1.5, 2.0])
    np.testing.assert_array_equal(np.asarray(bij.forward(x)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(bij.inverse(x)), np.asarray(x))
