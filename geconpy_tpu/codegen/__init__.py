"""sympy -> JAX lowering and compiled per-model function bundles."""

from .lower import CompiledFunction, lower_to_jax
from .model_functions import ModelFunctions, build_model_functions

__all__ = ["CompiledFunction", "lower_to_jax", "ModelFunctions",
           "build_model_functions"]
