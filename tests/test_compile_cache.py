"""Persistent (cross-process) XLA compilation cache wiring
(utils/compile_cache.py).

The in-process no-recompile guarantees are pinned by
tests/stats/test_mesh_fit.py::test_repeat_fit_reuses_sampler_programs; these
tests pin the CROSS-process story: a first process populates the on-disk
cache, a second process gets cache HITS for the same program (the
reference's analog is pytensor's on-disk module cache,
``gEconpy/pytensorf/compile.py:51``, which makes its rebuilds near-instant).

Run in subprocesses: the cache config must be set before anything compiles,
and a hit can only be demonstrated from a process that has compiled nothing.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import geconpy_tpu

cache_dir = sys.argv[1]
geconpy_tpu.enable_persistent_cache(cache_dir, min_compile_time_secs=0.0)
assert geconpy_tpu.persistent_cache_enabled() == os.path.abspath(cache_dir)
assert jax.config.jax_compilation_cache_dir == os.path.abspath(cache_dir)

hits = []
import jax.monitoring
jax.monitoring.register_event_listener(
    lambda name, **kw: hits.append(name)
    if name == "/jax/compilation_cache/cache_hits" else None)

import jax.numpy as jnp

@jax.jit
def f(x):
    # enough structure that the executable is worth persisting
    def body(c, _):
        return (c @ x + jnp.sin(c), None)
    out, _ = jax.lax.scan(body, x, None, length=8)
    return jnp.tanh(out).sum()

x = jnp.ones((64, 64), jnp.float32)
val = float(f(x))
print("HITS", len(hits), "VAL", val)
"""


def _run_child(cache_dir):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # a pre-set XLA cache dir in the environment would contaminate the test
    env.pop("GECONPY_TPU_CACHE_DIR", None)
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, cache_dir], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("HITS")][-1]
    _, n_hits, _, val = line.split()
    return int(n_hits), float(val)


def test_persistent_cache_cross_process(tmp_path):
    cache_dir = str(tmp_path / "xla_cache")

    hits_cold, val_cold = _run_child(cache_dir)
    assert hits_cold == 0  # nothing to hit on a fresh directory
    entries = [f for _, _, fs in os.walk(cache_dir) for f in fs]
    assert entries, "first process wrote no cache entries"

    hits_warm, val_warm = _run_child(cache_dir)
    assert hits_warm >= 1, "second process recompiled instead of hitting"
    assert val_warm == val_cold
