"""Device-memory accounting for compiled programs (peakmem benchmarking).

The reference's asv suite tracks host ``peakmem_*`` per pipeline stage
(``/root/reference/benchmarks/model/bench_model.py:26-47``).  On a TPU the
binding resource is the chip's HBM, and the right measurement is not a host
RSS probe but XLA's own buffer assignment: every jitted program knows, at
compile time, its argument/output/temp buffer sizes and the resulting peak
device allocation.  :func:`compiled_memory_summary` exposes that per
executable; :func:`program_memory` lowers+compiles a function for the
current backend and summarizes it.

Used by ``benchmarks/bench_suite.py`` (bytes-per-stage columns), ``bench.py``
(HBM peak for the flagship batch-4096 sweep and batch-512 value+grad
programs, captured in the round artifacts), and
``tests/test_memory_budget.py`` (headroom assertions).
"""

from __future__ import annotations

__all__ = ["compiled_memory_summary", "program_memory", "format_bytes"]


def compiled_memory_summary(compiled) -> dict:
    """Byte counts of one compiled executable (``jit(f).lower(...).compile()``).

    ``peak_bytes`` is XLA's peak device allocation over the program's
    lifetime (buffer-assignment high-watermark): arguments + outputs + the
    maximum live temp set.
    """
    ma = compiled.memory_analysis()
    return {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
        "peak_bytes": int(ma.peak_memory_in_bytes),
    }


def program_memory(fn, *args, **kwargs) -> dict:
    """Lower + compile ``fn`` for the current backend and summarize its
    device-memory footprint (compile-time exact; nothing is executed)."""
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    return compiled_memory_summary(compiled)


def format_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:.2f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024
    return f"{n:.2f} GiB"
