"""Tiny TPU tunnel probe: init backend, run one matmul, read back.

Run before launching any TPU work (the axon tunnel can be down; init then
hangs ~30 min — bound this with an outer timeout)."""
import time

t0 = time.perf_counter()
import jax
import jax.numpy as jnp
import numpy as np

devs = jax.devices()
print(f"devices ({time.perf_counter()-t0:.1f}s): {devs}", flush=True)
x = jnp.ones((1024, 1024), jnp.bfloat16)
y = jax.jit(lambda a: a @ a)(x)
v = float(np.asarray(y[0, 0], np.float32))
print(f"matmul ok ({time.perf_counter()-t0:.1f}s): {v}", flush=True)
