"""TPU probe: batched value+grad timing + profiler trace + stage split."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
import bench

platform = bench._probe_tunnel()
print("platform:", platform, flush=True)

batch = 512
ss = bench._configured_ss(bench.SW_ESTIMATED_FULL, filter_type="stationary",
                          kalman_settle=32)
data, draw = ss.data_from_prior(jax.random.PRNGKey(0), periods=200)
u0 = ss.unconstrain(draw).astype(jnp.float32)
U = u0[None, :] + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                           (batch, u0.shape[0]), jnp.float32)
data32 = np.asarray(data, np.float32)

t0 = time.time()
vag = jax.jit(ss.build_batched_logpost_and_grad(data32)).lower(U).compile()
print(f"compile vag: {time.time()-t0:.1f}s", flush=True)
vals, grads = jax.block_until_ready(vag(U))
print("finite:", int(jnp.isfinite(vals).sum()), "/", batch, flush=True)

def timeit(fn, arg, reps=20):
    out = jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * batch) * 1e6

print(f"VALUE+GRAD: {timeit(vag, U):.2f} us/draw", flush=True)

# forward-only for the split
t0 = time.time()
fwd = jax.jit(ss.build_batched_logpost(data32)).lower(U).compile()
print(f"compile fwd: {time.time()-t0:.1f}s", flush=True)
print(f"FORWARD:    {timeit(fwd, U):.2f} us/draw", flush=True)

# profile the value+grad loop
trace_dir = "/tmp/vg_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        out = vag(U)
    jax.block_until_ready(out)
from geconpy_tpu.utils.profiling import summarize_trace
try:
    table = summarize_trace(trace_dir)
    print(table.head(30).to_string(), flush=True)
except Exception as e:
    print("trace summary failed:", e, flush=True)
