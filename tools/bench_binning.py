"""Microbenchmarks for the binning bottleneck: compare sort strategies on
realistic pair distributions (T=512k triangles, K=16 slots, ~15% valid).
"""
import sys
import time

sys.path.insert(0, ".")


def main():
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    T, K = 524288, 16
    NT = 510
    P = T * K
    rng = np.random.default_rng(0)
    # ~15% of slots valid, tile ids clustered (realistic spatial coherence)
    valid = rng.uniform(size=(T, K)) < 0.12
    tiles = np.minimum((rng.normal(0.5, 0.2, size=(T, K)) * NT), NT - 1)
    tiles = np.abs(tiles).astype(np.int32) % NT
    tri = np.broadcast_to(np.arange(T, dtype=np.int32)[:, None], (T, K))
    keys_np = np.where(valid, (tiles << 22) | tri, np.int32(0x7FFFFFFF))
    keys = jnp.asarray(keys_np.reshape(-1))
    records = jnp.asarray(rng.normal(size=(T, 16)).astype(np.float32))

    def timed(fn, *args, n=8):
        @jax.jit
        def run(args):
            def body(c, eps):
                a2 = jax.tree_util.tree_map(
                    lambda l: l + eps.astype(l.dtype) if l.dtype != jnp.float32 else l + eps,
                    args)
                out = fn(*a2)
                leaves = jax.tree_util.tree_leaves(out)
                return c + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n, dtype=jnp.int32) * 0)
            return tot
        r = run(args); np.asarray(r)
        @jax.jit
        def nop(t): return t + 1
        np.asarray(nop(jnp.zeros(2)))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(nop(jnp.zeros(2)))
        floor = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        np.asarray(run(args))
        return (time.perf_counter() - t0 - floor) / n * 1e3

    which = set(sys.argv[1:]) or {"argsort", "fused", "gather", "scatter"}

    if "argsort" in which:
        def v_argsort(keys):
            order = jnp.argsort(keys)
            return keys[order][:100]
        print(f"argsort 8.4M + gather-keys:  {timed(v_argsort, keys):8.2f} ms", flush=True)

    if "fused" in which:
        def v_fused(keys):
            s = jax.lax.sort(keys, is_stable=False)
            return s[:100]
        print(f"fused single-key sort 8.4M:  {timed(v_fused, keys):8.2f} ms", flush=True)

    if "gather" in which:
        tri_sorted = jnp.asarray(rng.integers(0, T, size=P, dtype=np.int32))
        def v_gather(records, ids):
            return records[ids].sum(axis=0)
        print(f"record gather [8.4M,16]:     {timed(v_gather, records, tri_sorted):8.2f} ms", flush=True)

    if "scatter" in which:
        # compact-then-sort: cumsum offsets + scatter to a 2M capacity
        cap = 2 * 1024 * 1024
        kk = jnp.asarray(keys_np)  # [T, K]
        vv = jnp.asarray(valid)
        def v_scatter(kk, vv):
            ncover = vv.sum(axis=1).astype(jnp.int32)
            offs = jnp.cumsum(ncover) - ncover          # exclusive
            k_idx = jnp.cumsum(vv.astype(jnp.int32), axis=1) - 1
            pos = jnp.where(vv, offs[:, None] + k_idx, cap)
            out = jnp.full((cap,), jnp.int32(0x7FFFFFFF))
            out = out.at[pos.reshape(-1)].set(kk.reshape(-1), mode="drop")
            s = jax.lax.sort(out, is_stable=False)
            return s[:100]
        print(f"compact-scatter + sort 2M:   {timed(v_scatter, kk, vv):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
