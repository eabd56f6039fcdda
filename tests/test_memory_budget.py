"""Device-memory budget for the flagship benchmark configurations.

XLA's buffer assignment (``compiled.memory_analysis()``) is the
compile-time-exact device high-watermark per program — the TPU-native
``peakmem_*`` (reference: asv peakmem cases,
``/root/reference/benchmarks/model/bench_model.py:26-47``).  These tests
compile the flagship batch shapes on the CPU backend in float64 — a
CONSERVATIVE proxy for the 16 GB-HBM chip (same batched buffers at twice
the bytes per element; the Pallas kernels used on the real TPU hold
strictly smaller VMEM-tiled working sets than the XLA paths compiled here)
— and assert they fit with at least 2x headroom.  ``bench.py`` captures the
real-TPU peaks per round in the BENCH artifacts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HBM_BYTES = 16 * 1024 ** 3
SW_OBS = ["y", "c", "inve", "w", "pinf", "r", "lab"]


@pytest.fixture(scope="module")
def sw_ss():
    import geconpy_tpu
    from geconpy_tpu.stats.statespace import DSGEStateSpace

    model = geconpy_tpu.model_from_gcn(geconpy_tpu.get_example_gcn("sw2007"),
                                       verbose=False)
    ss = DSGEStateSpace(model)
    ss.configure(observed_states=SW_OBS, filter_type="stationary",
                 kalman_settle=32)
    data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
    return ss, np.asarray(data), ss.unconstrain(draw)


def _batch(u0, batch_size):
    noise = 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                     (batch_size, u0.shape[0]), u0.dtype)
    return u0[None, :] + noise


def test_sweep_batch4096_fits_hbm_with_headroom(sw_ss):
    """BASELINE config 4: SW-2007 prior sweep, 4096 draws in one program."""
    from geconpy_tpu.utils.memory import program_memory

    ss, data, u0 = sw_ss
    logpost = ss.build_logpost(data)
    mem = program_memory(jax.vmap(logpost), _batch(u0, 4096))
    assert mem["peak_bytes"] > 0
    assert mem["peak_bytes"] < HBM_BYTES // 2, (
        f"sweep peak {mem['peak_bytes'] / 2**30:.2f} GiB leaves <2x headroom "
        f"under 16 GiB HBM")


def test_value_grad_batch512_fits_hbm_with_headroom(sw_ss):
    """The NUTS leapfrog config: batch-512 value+grad on SW-2007."""
    from geconpy_tpu.utils.memory import program_memory

    ss, data, u0 = sw_ss
    logpost = ss.build_logpost(data)

    def value_and_grad(U):
        vals, vjp = jax.vjp(jax.vmap(logpost), U)
        (grads,) = vjp(jnp.ones_like(vals))
        return vals, grads

    mem = program_memory(value_and_grad, _batch(u0, 512))
    assert mem["peak_bytes"] > 0
    assert mem["peak_bytes"] < HBM_BYTES // 2, (
        f"value+grad peak {mem['peak_bytes'] / 2**30:.2f} GiB leaves <2x "
        f"headroom under 16 GiB HBM")


def test_memory_summary_plumbing():
    """The helper reports exact buffer sizes for a known-shape program."""
    from geconpy_tpu.utils.memory import (compiled_memory_summary,
                                          format_bytes, program_memory)

    x = jnp.ones((128, 128))
    mem = program_memory(lambda a: (a @ a).sum(), x)
    assert mem["argument_bytes"] == x.size * x.dtype.itemsize
    assert mem["peak_bytes"] >= mem["argument_bytes"]

    compiled = jax.jit(lambda a: a + 1.0).lower(x).compile()
    summ = compiled_memory_summary(compiled)
    assert set(summ) == {"argument_bytes", "output_bytes", "temp_bytes",
                         "code_bytes", "peak_bytes"}
    assert format_bytes(1536) == "1.50 KiB"
    assert format_bytes(3 * 1024 ** 3) == "3.00 GiB"
