"""Iskrev identification diagnostics.

Oracle: the nk_3eq label-switching fixture (see
test_nonidentification.py).  With only (x, pi) observed the likelihood
depends on the two demand disturbances only through rn - v, so at the
swap-symmetric parameter point the moment-Jacobian columns of
(rho_rn, rho_v) and (sigma_rn, sigma_v) coincide — rank deficiency of
exactly 2, null space spanned by the difference directions.  Observing the
policy rate restores full rank.
"""

import numpy as np
import pytest

from geconpy_tpu import get_example_gcn, model_from_gcn
from geconpy_tpu.stats.identification import iskrev_identification
from geconpy_tpu.stats.statespace import DSGEStateSpace

SYM_POINT = {"rho_rn": 0.6, "rho_v": 0.6,
             "sigma_rn": 0.003, "sigma_v": 0.003}


@pytest.fixture(scope="module")
def nk_model():
    return model_from_gcn(get_example_gcn("nk_3eq"), verbose=False)


def test_nk3eq_without_rate_is_rank_deficient(nk_model):
    ss = DSGEStateSpace(nk_model)
    ss.configure(observed_states=["x", "pi"],
                 constant_params=["beta", "kappa", "sigma", "phi_pi",
                                  "phi_x"])
    res = iskrev_identification(ss, params=SYM_POINT)
    assert not res.identified
    n_params = len(res.param_names)
    assert res.rank == n_params - 2

    # null space = the two swap-difference directions
    i_rr = res.param_names.index("rho_rn")
    i_rv = res.param_names.index("rho_v")
    i_sr = res.param_names.index("sigma_rn")
    i_sv = res.param_names.index("sigma_v")
    for col in res.nullspace.T:
        # each null vector lives in the 4-dim swap subspace and is odd
        # under the swap (difference direction)
        outside = np.delete(col, [i_rr, i_rv, i_sr, i_sv])
        if outside.size:
            assert np.abs(outside).max() < 1e-6
        np.testing.assert_allclose(col[i_rr], -col[i_rv], atol=1e-6)
        np.testing.assert_allclose(col[i_sr], -col[i_sv], atol=1e-6)

    # collinearity flags the degenerate columns as fully spanned
    assert res.collinearity[i_rr] > 1.0 - 1e-8
    assert res.collinearity[i_sr] > 1.0 - 1e-8


def test_nk3eq_with_rate_is_identified(nk_model):
    ss = DSGEStateSpace(nk_model)
    ss.configure(observed_states=["x", "pi", "i"],
                 measurement_error={"i": 0.001},
                 constant_params=["beta", "kappa", "sigma", "phi_pi",
                                  "phi_x"])
    res = iskrev_identification(ss, params=SYM_POINT)
    assert res.identified, (res.singular_values, res.summary())
    assert res.nullspace.shape[1] == 0


def test_rbc_estimation_identified():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y", "C"], measurement_error=["Y", "C"])
    res = iskrev_identification(ss)
    assert res.identified, res.singular_values
    # sane summary frame
    df = res.summary()
    assert list(df.index) == res.param_names
    assert np.all(res.collinearity <= 1.0 + 1e-9)


def test_jacobian_shape_and_labels():
    model = model_from_gcn(get_example_gcn("rbc_estimation"), verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=["Y"], measurement_error=["Y"])
    res = iskrev_identification(ss, n_lags=3)
    k = 1
    expected_rows = k + k * (k + 1) // 2 + 3 * k * k
    assert res.jacobian.shape == (expected_rows, ss.n_estimated)
    assert len(res.moment_labels) == expected_rows
