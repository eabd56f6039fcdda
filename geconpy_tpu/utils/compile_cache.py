"""Persistent (cross-process) XLA compilation cache.

The in-process caches already guarantee that repeat fits never recompile
(``stats/statespace.py::_cached_builder``, ``stats/nuts.py::_SAMPLER_CACHE``)
— but they die with the process, and a full SW-2007 NUTS program costs
minutes of XLA compilation (BENCH_r04: 893 s compile vs 433 s sampling
through the TPU tunnel).  The reference's pytensor backend compiles in
seconds because pytensor keeps an on-disk cache
(``/root/reference/gEconpy/pytensorf/compile.py:51`` — ``lru_cache`` over a
module cache that persists per-graph C modules); the JAX-native equivalent
is XLA's persistent compilation cache, which serializes compiled executables
keyed on (HLO, compile options, backend version) so a SECOND process pays
only deserialization.

Three config tiers (same pattern as precision/mesh config):

1. env — set ``GECONPY_TPU_CACHE_DIR`` before import and the package enables
   the cache automatically (``geconpy_tpu/__init__.py``);
2. call-site — ``fit(..., cache_dir=...)`` or an explicit
   :func:`enable_persistent_cache` call;
3. off by default — JAX semantics are unchanged unless asked for.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache", "persistent_cache_enabled"]

_ENV_VAR = "GECONPY_TPU_CACHE_DIR"
_enabled_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None, *,
                            min_compile_time_secs: float = 1.0) -> str:
    """Turn on XLA's on-disk compilation cache at ``cache_dir``.

    Compiled executables are written to ``cache_dir`` and reused by ANY
    later process with the same program/backend — a warm first fit skips
    the multi-minute XLA compile entirely.  Idempotent; returns the active
    cache directory.

    Parameters
    ----------
    cache_dir
        Directory for serialized executables (created if missing).  Defaults
        to ``$GECONPY_TPU_CACHE_DIR`` or ``~/.cache/geconpy_tpu/xla``.
    min_compile_time_secs
        Only compilations slower than this are persisted (keeps the cache
        free of trivial sub-second programs).  Set 0.0 to persist everything.
    """
    global _enabled_dir
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(_ENV_VAR) or os.path.join(
            os.path.expanduser("~"), ".cache", "geconpy_tpu", "xla")
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # size-0 entries (tiny executables) are still worth caching once the
    # compile-time floor has been passed
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = cache_dir
    return cache_dir


def persistent_cache_enabled() -> str | None:
    """The active cache directory, or None when the cache is off."""
    return _enabled_dir
