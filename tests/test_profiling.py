"""Trace aggregation (utils/profiling.py): real jax.profiler dump -> table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geconpy_tpu.utils.profiling import load_trace_events, summarize_trace


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trace")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)))

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x) @ x

    jax.block_until_ready(f(x))      # compile outside the trace
    with jax.profiler.trace(str(d)):
        for _ in range(3):
            jax.block_until_ready(f(x))
    return d


def test_load_trace_events(trace_dir):
    df = load_trace_events(trace_dir)
    assert len(df) > 0
    assert {"name", "dur_us", "track"} <= set(df.columns)
    assert (df["dur_us"] >= 0).all()


def test_summarize_trace(trace_dir):
    table = summarize_trace(trace_dir, device_only=False)
    assert table["total_us"].iloc[0] >= table["total_us"].iloc[-1]
    assert table["share"].sum() == pytest.approx(1.0, abs=1e-2)  # rows rounded to 4dp
    assert (table["calls"] >= 1).all()
    # the jitted computation shows up somewhere in the event names
    joined = " ".join(table.index.astype(str)).lower()
    assert "jit" in joined or "fusion" in joined or "dot" in joined


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        summarize_trace(tmp_path / "nope")
