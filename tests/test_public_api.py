"""Top-level API parity: every user-facing name the reference exports from
``gEconpy`` must have a working counterpart in ``geconpy_tpu``
(reference ``__init__.py:72-104``)."""

import numpy as np
import pandas as pd
import pytest

import geconpy_tpu as gt

REFERENCE_NAMES = [
    # gEconpy/__init__.py __all__, minus pytensor-specific internals
    # (classes/parser/solvers/utilities subpackage aliases map to our
    # symbolic/lang/ops packages).
    "autocorrelation_matrix", "autocovariance_matrix", "bounds_from_priors",
    "build_Q_matrix", "check_bk_condition", "check_steady_state",
    "data_from_prior", "impulse_response_function", "make_mod_file",
    "matrix_to_dataframe", "model_from_gcn", "prepare_mixed_frequency_data",
    "print_gcn_file", "print_steady_state", "prior_solvability_check",
    "sample_from_priors", "sample_from_priors_qmc", "sample_uniform",
    "sample_uniform_from_priors", "simulate", "solvability_check",
    "solve_perfect_foresight", "statespace_from_gcn",
    "stationary_covariance_matrix", "summarize_perturbation_solution",
]


def test_reference_names_all_present():
    missing = [n for n in REFERENCE_NAMES if not hasattr(gt, n)]
    assert not missing, f"missing reference API names: {missing}"
    not_exported = [n for n in REFERENCE_NAMES if n not in gt.__all__]
    assert not_exported == [], f"present but not in __all__: {not_exported}"


@pytest.fixture(scope="module")
def rbc():
    return gt.model_from_gcn(gt.get_example_gcn("rbc"), verbose=False)


@pytest.fixture(scope="module")
def rbc_solution(rbc):
    return rbc.solve_model(verbose=False)


class TestBuildQMatrix:
    def test_default_identity(self):
        assert np.allclose(gt.build_Q_matrix(["e_a", "e_b"]), np.eye(2))

    def test_std_dict_partial(self):
        Q = gt.build_Q_matrix(["e_a", "e_b"], shock_std_dict={"e_b": 0.5})
        assert np.allclose(Q, np.diag([0.0, 0.25]))

    def test_scalar_std(self):
        Q = gt.build_Q_matrix(["e_a", "e_b"], shock_std=0.1)
        assert np.allclose(Q, 0.01 * np.eye(2))

    def test_cov_matrix_passthrough(self):
        C = np.array([[0.04, 0.01], [0.01, 0.09]])
        assert np.allclose(gt.build_Q_matrix(["e_a", "e_b"],
                                             shock_cov_matrix=C), C)

    def test_conflicting_options_raise(self):
        with pytest.raises(ValueError):
            gt.build_Q_matrix(["e_a"], shock_std=0.1,
                              shock_std_dict={"e_a": 0.1})

    def test_unknown_shock_name_raises(self):
        with pytest.raises(ValueError):
            gt.build_Q_matrix(["e_a"], shock_std_dict={"nope": 0.1})

    def test_wrong_cov_shape_raises(self):
        with pytest.raises(ValueError):
            gt.build_Q_matrix(["e_a", "e_b"], shock_cov_matrix=np.eye(3))


class TestMatrixToDataframe:
    def test_square_variable_matrix(self, rbc, rbc_solution):
        T = rbc_solution.T.to_numpy()
        df = gt.matrix_to_dataframe(T, rbc)
        assert list(df.index) == rbc.variables
        assert list(df.columns) == rbc.variables
        np.testing.assert_allclose(df.to_numpy(), T)

    def test_impact_matrix_infers_shock_dim(self, rbc, rbc_solution):
        R = rbc_solution.R.to_numpy()
        df = gt.matrix_to_dataframe(R, rbc)
        assert list(df.index) == rbc.variables
        assert list(df.columns) == rbc.shocks

    def test_round(self, rbc, rbc_solution):
        df = gt.matrix_to_dataframe(rbc_solution.T.to_numpy(), rbc, round=2)
        assert (np.abs(df.to_numpy() * 100 -
                       np.round(df.to_numpy() * 100)) < 1e-9).all()

    def test_bad_shapes_raise(self, rbc):
        with pytest.raises(ValueError):
            gt.matrix_to_dataframe(np.zeros((3,)), rbc)
        with pytest.raises(ValueError):
            gt.matrix_to_dataframe(np.zeros((999, 999)), rbc)


class TestCheckSteadyState:
    def test_solved_ss_passes(self, rbc):
        assert gt.check_steady_state(rbc) is True

    def test_perturbed_ss_fails_and_logs(self, rbc, caplog):
        ss = rbc.steady_state(verbose=False)
        bad = dict(ss)
        first = next(iter(bad))
        bad[first] = float(bad[first]) + 1.0
        import logging

        with caplog.at_level(logging.WARNING,
                             logger="geconpy_tpu.models.validation"):
            ok = gt.check_steady_state(rbc, steady_state=bad)
        assert ok is False
        assert "NOT successful" in caplog.text

    def test_residual_evaluation_matches_solver_norm(self, rbc):
        from geconpy_tpu.models.validation import (
            evaluate_steady_state_residuals,
        )

        ss = rbc.steady_state(verbose=False)
        resid = evaluate_steady_state_residuals(rbc, ss)
        assert np.max(np.abs(resid)) < 1e-7


class TestSampleUniform:
    @pytest.mark.parametrize("method", ["random", "lhs", "sobol", "halton"])
    def test_within_bounds(self, method):
        bounds = {"alpha": (0.2, 0.4), "beta": (0.9, 0.999)}
        draws = gt.sample_uniform(bounds, n_draws=64, method=method, seed=1)
        for name, (lo, hi) in bounds.items():
            assert draws[name].shape == (64,)
            assert draws[name].min() >= lo and draws[name].max() <= hi

    def test_bad_bounds_raise(self):
        with pytest.raises(ValueError):
            gt.sample_uniform({"a": (1.0, 0.5)}, n_draws=8)


class TestAutocorrelationMatrix:
    def test_lag0_unit_diagonal(self, rbc_solution):
        acf = gt.autocorrelation_matrix(rbc_solution, n_lags=4)
        lag0 = acf.loc[0]
        np.testing.assert_allclose(np.diag(lag0.to_numpy()), 1.0, atol=1e-6)

    def test_matches_autocovariance_alias(self, rbc_solution):
        acf = gt.autocorrelation_matrix(rbc_solution, n_lags=3)
        acov = gt.autocovariance_matrix(rbc_solution, n_lags=3,
                                        correlation=True)
        pd.testing.assert_frame_equal(acf, acov)


class TestStandaloneFacades:
    def test_print_gcn_file_renders_blocks(self):
        html = gt.print_gcn_file(gt.get_example_gcn("rbc"))
        assert "<details" in html and "Block:" in html

    def test_check_bk_condition_facade(self, rbc):
        df = gt.check_bk_condition(rbc, verbose=False)
        assert "Modulus" in df.columns or df.shape[1] >= 2

    def test_data_from_prior_facade(self):
        ss = gt.statespace_from_gcn(gt.get_example_gcn("rbc_estimation"),
                                    verbose=False,
                                    observed_states=["Y"])
        data, draw = gt.data_from_prior(ss, periods=24)
        assert np.asarray(data).shape[0] == 24
        assert isinstance(draw, dict) and len(draw) > 0
