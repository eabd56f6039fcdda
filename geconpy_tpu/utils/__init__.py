from .profiling import load_trace_events, summarize_trace
from .reporting import block_to_html, build_report, model_to_html, print_steady_state

__all__ = ["block_to_html", "build_report", "model_to_html",
           "print_steady_state", "load_trace_events", "summarize_trace"]
