"""Micro-benchmark: multi-index vs flattened-index gathers on TPU.

Hypothesis: `img[ty, tx]` (two index arrays) lowers to a far slower XLA
gather than `img.reshape(-1, C)[ty * w + tx]` (one flat index), which was
measured at ~1 element/cycle. Run alone — one axon client at a time.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    h, w = 1080, 1920
    th, tw = 512, 512
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(th, tw, 3)).astype(np.float32))
    cube = jnp.asarray(rng.uniform(size=(6, 128, 128, 3)).astype(np.float32))
    ty0 = jnp.asarray(rng.integers(0, th, (16, h, w)).astype(np.int32))
    tx0 = jnp.asarray(rng.integers(0, tw, (16, h, w)).astype(np.int32))
    f0 = jnp.asarray(rng.integers(0, 6, (16, h, w)).astype(np.int32))

    def timed(name, fn, args):
        @jax.jit
        def run_n(args):
            def step(carry, a):
                return carry + fn(*a), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), args)
            return tot

        @jax.jit
        def nop(t):
            return t + 1

        _ = np.asarray(run_n(args))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(args))
        ms = (time.perf_counter() - t0 - floor) / 16 * 1e3
        print(f"{name:34s} {ms:8.2f} ms", flush=True)

    timed("2d-index img[ty,tx] rgb",
          lambda ty, tx: img[ty, tx].sum(), (ty0, tx0))
    timed("flat img.r(-1,3)[ty*w+tx] rgb",
          lambda ty, tx: img.reshape(-1, 3)[ty * tw + tx].sum(), (ty0, tx0))
    timed("3d-index cube[f,ty,tx] rgb",
          lambda f, ty, tx: cube[f, ty % 128, tx % 128].sum(), (f0, ty0, tx0))
    timed("flat cube idx rgb",
          lambda f, ty, tx: cube.reshape(-1, 3)[
              (f * 128 + ty % 128) * 128 + tx % 128].sum(), (f0, ty0, tx0))
    timed("flat scalar img2d[ty*w+tx]",
          lambda ty, tx: img[..., 0].reshape(-1)[ty * tw + tx].sum(),
          (ty0, tx0))


if __name__ == "__main__":
    main()
