import time
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices())
from geconpy_tpu import model_from_gcn
from geconpy_tpu.stats.statespace import DSGEStateSpace

model = model_from_gcn('geconpy_tpu/data/rbc_estimation.gcn', verbose=False)
ss = DSGEStateSpace(model)
ss.configure(observed_states=['Y','C'], measurement_error=['Y','C'])
data, draw = ss.data_from_prior(jax.random.PRNGKey(1), periods=200)
u = jnp.asarray(ss.unconstrain(draw), jnp.float32)
data = np.asarray(data, np.float32)

lp = jax.jit(ss.build_logpost_second_order(data, jitter=1e-7))
vg = jax.jit(jax.value_and_grad(ss.build_logpost_second_order(data, jitter=1e-7)))

t0 = time.time(); v = lp(u); jax.block_until_ready(v)
print(f"lp compile {time.time()-t0:.1f}s value {float(v):.3f}")
t0 = time.time(); vv, g = vg(u); jax.block_until_ready(g)
print(f"vg compile {time.time()-t0:.1f}s value {float(vv):.3f} grad finite {bool(jnp.all(jnp.isfinite(g)))}")

# timing: single-draw latency
for name, f in [("lp", lambda: lp(u)), ("vg", lambda: vg(u)[1])]:
    r = f(); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(50): r = f()
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/50*1e3:.2f} ms/draw")

# batched chains (the NUTS shape): vmap over 128 lockstep chains
vg_b = jax.jit(jax.vmap(jax.value_and_grad(ss.build_logpost_second_order(data, jitter=1e-7))))
U = u[None, :] + 0.01 * jax.random.normal(jax.random.PRNGKey(0), (128, u.shape[0]), jnp.float32)
t0 = time.time(); vv, g = vg_b(U); jax.block_until_ready(g)
print(f"vg_b compile {time.time()-t0:.1f}s finite {int(jnp.isfinite(vv).sum())}/128")
t0 = time.time()
for _ in range(20): _, g = vg_b(U)
jax.block_until_ready(g)
dt = (time.time()-t0)/20
print(f"batched value+grad: {dt*1e3:.1f} ms/step = {dt/128*1e6:.1f} us/draw at batch 128")
