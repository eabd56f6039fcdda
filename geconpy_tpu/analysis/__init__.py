from .dynare import DynarePrinter, make_mod_file
from .occbin import OccbinResult, occbin_irf, solve_occbin
from .perfect_foresight import PerfectForesightResult, solve_perfect_foresight
from .simulate import (
    impulse_response,
    impulse_response_function,
    impulse_response_second_order,
    simulate,
    simulate_linear,
    simulate_second_order,
)

__all__ = [
    "DynarePrinter", "make_mod_file",
    "OccbinResult", "solve_occbin", "occbin_irf",
    "PerfectForesightResult", "solve_perfect_foresight",
    "impulse_response", "impulse_response_function", "simulate",
    "simulate_linear", "simulate_second_order",
    "impulse_response_second_order",
]
