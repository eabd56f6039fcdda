from .core import (
    Beta,
    DIST_REGISTRY,
    Distribution,
    Exponential,
    Gamma,
    HalfNormal,
    InverseGamma,
    LogNormal,
    Normal,
    PartialCorrelation,
    StudentT,
    Truncated,
    TruncatedNormal,
    Uniform,
    get_distribution_class,
    maxent,
)
from .from_ast import CompositeDistribution, ast_to_distribution, resolve_priors

__all__ = [
    "Beta", "DIST_REGISTRY", "Distribution", "Exponential", "Gamma",
    "HalfNormal", "InverseGamma", "LogNormal", "Normal",
    "PartialCorrelation", "StudentT",
    "Truncated", "TruncatedNormal", "Uniform", "get_distribution_class",
    "maxent", "CompositeDistribution", "ast_to_distribution", "resolve_priors",
]
