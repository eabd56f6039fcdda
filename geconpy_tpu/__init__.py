"""geconpy_tpu — a TPU-native DSGE modeling framework.

Capabilities parity with `jessegrabowski/gEconpy`, re-designed for JAX/XLA on
TPU: GCN model language -> symbolic FOC derivation -> jitted steady-state and
first-order perturbation solvers -> device-side Kalman filtering and NUTS
estimation, with vmap over parameter draws and shard_map over device meshes.
"""

__version__ = "0.1.0"

import os as _os

from .analysis.dynare import make_mod_file
from .analysis.occbin import OccbinResult, solve_occbin
from .analysis.perfect_foresight import PerfectForesightResult, solve_perfect_foresight
from .analysis.simulate import impulse_response_function, simulate
from .lang import parse_gcn, print_model
from .models.model import Model, PolicySolution, model_from_gcn
from .models.primitives import ModelPrimitives, load_gcn, load_gcn_file
from .models.validation import check_steady_state
from .stats.covariance import (
    autocorrelation_matrix,
    autocovariance_matrix,
    build_Q_matrix,
    stationary_covariance_matrix,
)
from .stats.estimation import PosteriorResult, fit
from .stats.smc import SMCResult, fit_smc
from .stats.forecast import conditional_forecast, posterior_forecast
from .stats.perturbation_diagnostics import (
    bk_condition_sweep,
    check_bk_condition,
    eigenvalue_sensitivity,
    prior_solvability_check,
    solvability_check,
    summarize_perturbation_solution,
)
from .stats.posterior import prepare_mixed_frequency_data
from .stats.sampling import (
    bounds_from_priors,
    sample_from_priors,
    sample_from_priors_qmc,
    sample_uniform,
    sample_uniform_from_priors,
)
from .stats.statespace import DSGEStateSpace, data_from_prior, statespace_from_gcn
from .symbolic import SteadyStateResults, SymbolDictionary, TimeAwareSymbol
from .utils.compile_cache import enable_persistent_cache, persistent_cache_enabled
from .utils.formatting import matrix_to_dataframe
from .utils.reporting import print_gcn_file, print_steady_state

# env config tier: GECONPY_TPU_CACHE_DIR turns on the persistent (on-disk,
# cross-process) XLA compilation cache at import — warm processes then
# deserialize the multi-minute estimation executables instead of recompiling
if _os.environ.get("GECONPY_TPU_CACHE_DIR"):
    enable_persistent_cache()


def get_example_gcn(name: str = "rbc") -> str:
    """Return the source of a bundled example model (see geconpy_tpu/data)."""
    import pathlib

    data_dir = pathlib.Path(__file__).parent / "data"
    path = data_dir / f"{name}.gcn"
    if not path.exists():
        available = sorted(p.stem for p in data_dir.glob("*.gcn"))
        raise FileNotFoundError(f"no example model {name!r}; available: {available}")
    return path.read_text()


__all__ = [
    "Model",
    "PolicySolution",
    "ModelPrimitives",
    "SteadyStateResults",
    "SymbolDictionary",
    "TimeAwareSymbol",
    "DSGEStateSpace",
    "statespace_from_gcn",
    "PosteriorResult",
    "PerfectForesightResult",
    "model_from_gcn",
    "load_gcn",
    "load_gcn_file",
    "parse_gcn",
    "print_model",
    "simulate",
    "impulse_response_function",
    "stationary_covariance_matrix",
    "autocovariance_matrix",
    "solve_perfect_foresight",
    "solve_occbin",
    "make_mod_file",
    "fit",
    "fit_smc",
    "posterior_forecast",
    "conditional_forecast",
    "solvability_check",
    "prior_solvability_check",
    "summarize_perturbation_solution",
    "get_example_gcn",
    "autocorrelation_matrix",
    "bounds_from_priors",
    "build_Q_matrix",
    "check_bk_condition", "bk_condition_sweep",
    "check_steady_state",
    "data_from_prior",
    "eigenvalue_sensitivity",
    "enable_persistent_cache",
    "persistent_cache_enabled",
    "matrix_to_dataframe",
    "prepare_mixed_frequency_data",
    "print_gcn_file",
    "print_steady_state",
    "sample_from_priors",
    "sample_from_priors_qmc",
    "sample_uniform",
    "sample_uniform_from_priors",
]
