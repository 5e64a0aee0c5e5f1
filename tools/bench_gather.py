"""Measure TPU gather cost model: 2M-pixel row gathers from a [T, R] table
for varying row widths and dtypes — decides how to optimize the resolve
and material passes."""
import sys
import time

sys.path.insert(0, ".")


def main():
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    H, W, T = 1088, 1920, 524288
    rng = np.random.default_rng(0)
    # spatially coherent ids (like a real visibility buffer)
    base = rng.integers(0, T, size=(H // 16, W // 16))
    ids = jnp.asarray(np.repeat(np.repeat(base, 16, 0), 16, 1)[:H, :W]
                      .astype(np.int32))
    ids_random = jnp.asarray(rng.integers(0, T, size=(H, W), dtype=np.int32))

    @jax.jit
    def nop(t):
        return t + 1

    def timed(fn, *args, n=8):
        @jax.jit
        def run(args):
            def body(c, i):
                out = fn(*jax.tree_util.tree_map(
                    lambda l: l if l.dtype != jnp.int32 else
                    jnp.minimum(l + i, T - 1), args))
                return c + out.astype(jnp.float32).sum(), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.int32))
            return tot
        np.asarray(run(args))
        np.asarray(nop(jnp.zeros(2)))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(nop(jnp.zeros(2)))
        floor = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        np.asarray(run(args))
        return (time.perf_counter() - t0 - floor) / n * 1e3

    which = sys.argv[1:] or ["r4", "r16", "r48", "bf16", "rand"]
    for name in which:
        if name.startswith("r") and name[1:].isdigit():
            r = int(name[1:])
            table = jnp.asarray(rng.normal(size=(T, r)).astype(np.float32))
            ms = timed(lambda i, tb=table: tb[i].sum(-1), ids)
            print(f"gather [2M] x [T,{r}] f32 coherent: {ms:8.2f} ms", flush=True)
        elif name == "bf16":
            table = jnp.asarray(rng.normal(size=(T, 48)).astype(np.float32)).astype(jnp.bfloat16)
            ms = timed(lambda i, tb=table: tb[i].astype(jnp.float32).sum(-1), ids)
            print(f"gather [2M] x [T,48] bf16 coherent: {ms:8.2f} ms", flush=True)
        elif name == "rand":
            table = jnp.asarray(rng.normal(size=(T, 48)).astype(np.float32))
            ms = timed(lambda i, tb=table: tb[i].sum(-1), ids_random)
            print(f"gather [2M] x [T,48] f32 random:   {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
