from .checkpoint import fit_with_checkpointing, load_checkpoint, save_checkpoint
from .covariance import (
    autocorrelation,
    autocovariance,
    autocovariance_matrix,
    fevd,
    stationary_covariance,
    stationary_covariance_matrix,
)
from .diagnostics import effective_sample_size, split_rhat, summarize_chains
from .estimation import PosteriorResult, fit, fit_pmmh
from .ml import MLResult, fit_ml
from .model_comparison import (
    compare_models,
    find_map,
    laplace_evidence,
    marginal_likelihood,
    modified_harmonic_mean,
)
from .nonlinear import (
    build_logpost_second_order,
    build_pf_loglik_second_order,
    build_second_order_solution_fn,
    filter_data_second_order,
    quadratic_drive_covariance,
)
from .dsge_var import (
    dsge_var_lambda_profile,
    dsge_var_marginal_likelihood,
    dsge_var_moments,
)
from .forecast import conditional_forecast, posterior_forecast
from .identification import IdentificationResult, iskrev_identification
from .irf_matching import IRFMatchResult, build_irf_fn, fit_irf_matching
from .moment_matching import MomentMatchResult, fit_moment_matching, model_moments
from .nuts import NUTSResult, nuts_kernel, sample_nuts
from .pmmh import PMMHResult, sample_pmmh
from .perturbation_diagnostics import (
    bk_condition_sweep,
    make_bk_count_fn,
    eigenvalue_sensitivity,
    spectral_radius_sensitivity,
    prior_solvability_check,
    solvability_check,
    summarize_perturbation_solution,
)
from .posterior import (
    posterior_autocorrelation,
    posterior_diagnostics,
    posterior_fevd,
    posterior_girfs,
    posterior_irfs,
    posterior_predictive,
    posterior_smoothed_states,
    prepare_mixed_frequency_data,
)
from .smc import SMCResult, fit_smc
from .sampling import (
    bounds_from_priors,
    sample_from_priors,
    sample_from_priors_qmc,
    sample_uniform_from_priors,
)
from .statespace import DSGEStateSpace, EstimatedParameter, LogPostExtras

__all__ = [
    "DSGEStateSpace", "EstimatedParameter", "LogPostExtras",
    "PosteriorResult", "fit", "fit_with_checkpointing",
    "load_checkpoint", "save_checkpoint",
    "NUTSResult", "nuts_kernel", "sample_nuts",
    "posterior_forecast", "conditional_forecast",
    "SMCResult", "fit_smc",
    "dsge_var_marginal_likelihood", "dsge_var_lambda_profile",
    "dsge_var_moments",
    "IRFMatchResult", "build_irf_fn", "fit_irf_matching",
    "MomentMatchResult", "fit_moment_matching", "model_moments",
    "MLResult", "fit_ml", "compare_models",
    "effective_sample_size", "split_rhat", "summarize_chains",
    "stationary_covariance", "stationary_covariance_matrix",
    "autocovariance", "autocovariance_matrix", "autocorrelation", "fevd",
    "eigenvalue_sensitivity", "spectral_radius_sensitivity",
    "prior_solvability_check", "solvability_check",
    "summarize_perturbation_solution", "bk_condition_sweep", "make_bk_count_fn",
    "posterior_irfs", "posterior_autocorrelation", "posterior_fevd",
    "posterior_smoothed_states", "posterior_diagnostics",
    "prepare_mixed_frequency_data",
    "bounds_from_priors", "sample_from_priors", "sample_from_priors_qmc",
    "sample_uniform_from_priors",
]
