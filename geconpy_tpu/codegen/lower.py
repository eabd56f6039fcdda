"""sympy -> JAX lowering.

Replaces the reference's sympy -> pytensor bridge
(``gEconpy/model/compile.py``: sympy_to_pytensor:104,
build_symbolic_jacobians:163, pack_and_compile:402) with direct source-code
generation of jittable JAX functions.  Design differences from the reference,
chosen for the TPU/XLA compilation model:

- **Symbolic differentiation only where sparsity pays.**  Steady-state and
  policy-solve Jacobians come from ``jax.jacfwd``/``jacrev`` of the lowered
  residual (exact, traces once, fuses downstream); the LINEARIZATION
  Jacobian — the per-draw hot-path one — is differentiated in sympy at
  build time like the reference (shared CSE over the nonzero [A|B|C|D]
  entries, ``gEconpy/model/compile.py:163``) because the stacked block is
  >95% structural zeros that forward-mode would otherwise pay for
  (``codegen/model_functions.py`` f_lin_nz).
- **Vector-packed inputs.**  Every generated function takes flat arrays
  (variables, parameters, shocks) so it is trivially ``vmap``-able and keeps
  static shapes fixed at model-build time.
- **Common-subexpression elimination** still runs (sympy ``cse``) — it
  shrinks the *traced* program, which matters for trace and compile time on
  large models, even though XLA would re-fuse the arithmetic anyway.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Callable, Sequence

import sympy as sp
from sympy.printing.numpy import JaxPrinter


__all__ = ["lower_to_jax", "CompiledFunction"]

_FN_CACHE: dict[str, Callable] = {}


class _Printer(JaxPrinter):
    """JaxPrinter with short module alias and float-safe rationals.

    Also routes the gamma/error-function family to ``jax.scipy.special`` —
    sympy's stock ``JaxPrinter`` falls back to ``math.erf`` etc. for these,
    which is not in the generated namespace and would not trace under jit
    anyway (GCN priors and utility curvature terms can reference them).
    """

    _module = "jnp"

    def _jsp(target):
        def _print(self, expr):
            args = ", ".join(self._print(a) for a in expr.args)
            return f"jax.scipy.special.{target}({args})"
        return _print

    # sympy installs `_print_erf = math.erf`-style known-function printers as
    # class attributes, so a `_print_Function` override never sees these —
    # each one must be shadowed by name.
    _print_erf = _jsp("erf")
    _print_erfc = _jsp("erfc")
    _print_erfinv = _jsp("erfinv")
    _print_gamma = _jsp("gamma")
    _print_loggamma = _jsp("gammaln")
    _print_polygamma = _jsp("polygamma")
    _print_digamma = _jsp("digamma")
    del _jsp

    def _print_Rational(self, expr):
        return f"({expr.p}/{expr.q})"

    def _print_Float(self, expr):
        return repr(float(expr))

    def _print_Symbol(self, expr):
        return _mangle(expr)


def _mangle(symbol: sp.Symbol) -> str:
    """Unique, keyword-safe local identifier for a sympy symbol."""
    name = symbol.name
    out = []
    for ch in name:
        out.append(ch if (ch.isalnum() or ch == "_") else f"_u{ord(ch):x}_")
    text = "".join(out)
    if not (text[0].isalpha() or text[0] == "_"):
        text = "_" + text
    return "s_" + text


@dataclass
class CompiledFunction:
    """A generated JAX function plus its provenance."""

    fn: Callable
    source: str
    group_names: tuple[str, ...]
    group_symbols: tuple[tuple[sp.Symbol, ...], ...]
    output_shape: tuple[int, ...]

    def __call__(self, *args):
        """Evaluate the compiled function (jittable; args follow ``argspec``)."""
        return self.fn(*args)


def lower_to_jax(
    outputs: Sequence[sp.Expr] | sp.Matrix,
    groups: Sequence[tuple[str, Sequence[sp.Symbol]]],
    name: str = "lowered_fn",
    cse: bool = True,
    docstring: str | None = None,
) -> CompiledFunction:
    """Generate a JAX function computing ``outputs`` from packed input arrays.

    Parameters
    ----------
    outputs
        Sympy expressions.  A flat sequence produces a 1-D output array; a
        ``sp.Matrix`` produces a 2-D array of its shape.
    groups
        Ordered ``(group_name, symbols)`` pairs.  The generated function takes
        one flat array argument per group; symbol *i* of group *g* is read
        from ``g[i]``.
    name
        Function name in the generated source (diagnostics only).
    cse
        Run sympy common-subexpression elimination before printing.

    Returns
    -------
    CompiledFunction
        Wraps the generated function; ``fn(*arrays) -> jnp.ndarray``.
    """
    if isinstance(outputs, sp.Matrix):
        out_shape: tuple[int, ...] = tuple(outputs.shape)
        flat_outputs = list(outputs)
    else:
        flat_outputs = list(outputs)
        out_shape = (len(flat_outputs),)

    flat_outputs = [sp.sympify(o) for o in flat_outputs]

    # map every referenced symbol to an input slot
    slot_of: dict[sp.Symbol, str] = {}
    lines: list[str] = []
    group_names = tuple(g for g, _ in groups)
    arg_list = ", ".join(group_names)
    lines.append(f"def {name}({arg_list}):")
    if docstring:
        lines.append(f'    """{docstring}"""')

    needed: set[sp.Symbol] = set()
    for expr in flat_outputs:
        needed |= expr.free_symbols

    for g_name, symbols in groups:
        for i, s in enumerate(symbols):
            slot_of[s] = f"{g_name}[{i}]"
            if s in needed:
                lines.append(f"    {_mangle(s)} = {g_name}[{i}]")

    missing = needed - set(slot_of)
    if missing:
        raise ValueError(
            f"expressions reference symbols not present in any input group: "
            f"{sorted(str(m) for m in missing)}")

    printer = _Printer()

    if cse and flat_outputs:
        cse_symbols = sp.numbered_symbols("_cse")
        replacements, reduced = sp.cse(flat_outputs, symbols=cse_symbols,
                                       order="none", list=True)
        for lhs, rhs in replacements:
            lines.append(f"    {_mangle(lhs)} = {printer.doprint(rhs)}")
        printed = [printer.doprint(e) for e in reduced]
    else:
        printed = [printer.doprint(e) for e in flat_outputs]

    if not printed:
        body = "jnp.zeros((0,))"
    else:
        joined = ", ".join(printed)
        body = f"jnp.stack([{joined}])"
        if len(out_shape) == 2:
            body += f".reshape({out_shape[0]}, {out_shape[1]})"
    lines.append(f"    return {body}")
    source = "\n".join(lines)

    key = hashlib.sha256(source.encode()).hexdigest()
    if key in _FN_CACHE:
        fn = _FN_CACHE[key]
    else:
        import functools

        import jax
        import jax.numpy as jnp

        namespace = {"jnp": jnp, "jax": jax, "functools": functools}
        exec(compile(source, f"<geconpy_tpu:{name}>", "exec"), namespace)
        fn = namespace[name]
        _FN_CACHE[key] = fn

    return CompiledFunction(
        fn=fn,
        source=source,
        group_names=group_names,
        group_symbols=tuple(tuple(s for s in symbols) for _, symbols in groups),
        output_shape=out_shape,
    )
