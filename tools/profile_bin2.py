"""Isolate binning primitives on TPU at the LIVE (corner-path) sizes:
pair expansion, compact scatter, lax.sort, searchsorted-based compaction,
radix-rank counting passes, record gather. Decides the binning redesign.
Run alone — one axon client at a time.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    T = 284_160          # live triangle count (bench scene, group-rounded)
    K = 16
    NT = 1020            # 1080p tiles at 16x128
    CAP = T
    rng = np.random.default_rng(0)

    # synthetic but realistic: ~55% of triangles live, avg 1.3 tiles each
    ncover = np.where(rng.random(T) < 0.55,
                      rng.choice([1, 1, 1, 2, 2, 4], size=T), 0)
    tile0 = rng.integers(0, NT - 4, size=T)
    n_batch = 8

    def batch(x):
        return jnp.asarray(np.stack([x] * 1))  # single config; scan varies seed

    ncover_d = jnp.asarray(ncover.astype(np.int32))
    tile0_d = jnp.asarray(tile0.astype(np.int32))
    records_d = jnp.asarray(rng.random((T, 32), np.float32))
    seeds = jnp.arange(n_batch, dtype=jnp.int32)

    def timed(name, fn):
        @jax.jit
        def run(seeds):
            def step(c, s):
                return c + fn(s), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), seeds)
            return tot

        @jax.jit
        def nop(t):
            return t + 1

        _ = np.asarray(run(seeds))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run(seeds))
        ms = (time.perf_counter() - t0 - floor) / n_batch * 1e3
        print(f"{name:34s} {ms:8.2f} ms", flush=True)

    kmax = jnp.arange(K, dtype=jnp.int32)[None, :]

    def expansion(s):
        nc = jnp.roll(ncover_d, s)          # vary input so XLA can't hoist
        ok = kmax < nc[:, None]
        tile = tile0_d[:, None] + kmax
        keys = (tile.astype(jnp.uint32) << 22) | jax.lax.broadcasted_iota(
            jnp.uint32, (T, K), 0)
        n_eff = ok.sum(axis=1)
        offs = jnp.cumsum(n_eff) - n_eff
        k_rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        pos = jnp.where(ok, offs[:, None] + k_rank, CAP)
        return (keys.astype(jnp.float32).sum() + pos.sum()).astype(jnp.float32)

    def scatter_tk(s):
        nc = jnp.roll(ncover_d, s)
        ok = kmax < nc[:, None]
        tile = tile0_d[:, None] + kmax
        keys = (tile.astype(jnp.uint32) << 22) | jax.lax.broadcasted_iota(
            jnp.uint32, (T, K), 0)
        n_eff = ok.sum(axis=1)
        offs = jnp.cumsum(n_eff) - n_eff
        k_rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
        pos = jnp.where(ok, offs[:, None] + k_rank, CAP)
        compact = jnp.full((CAP,), jnp.uint32(0xFFFFFFFF))
        compact = compact.at[pos.reshape(-1)].set(keys.reshape(-1),
                                                  mode="drop")
        return compact.astype(jnp.float32).sum()

    def compact_via_repeat(s):
        """Gather-based compaction: t(p) by searchsorted over offs, then
        key computed arithmetically — no T*K scatter, no [T,K] tensors."""
        nc = jnp.roll(ncover_d, s)
        offs = jnp.cumsum(nc) - nc
        p = jnp.arange(CAP, dtype=jnp.int32)
        t_of_p = jnp.searchsorted(offs + nc, p, side="right").astype(jnp.int32)
        t_of_p = jnp.minimum(t_of_p, T - 1)
        k_of_p = p - offs[t_of_p]
        live = k_of_p < nc[t_of_p]
        tile = tile0_d[t_of_p] + k_of_p
        keys = jnp.where(live,
                         (tile.astype(jnp.uint32) << 22)
                         | t_of_p.astype(jnp.uint32),
                         jnp.uint32(0xFFFFFFFF))
        return keys.astype(jnp.float32).sum()

    def sort_only(s):
        k = jax.random.bits(jax.random.PRNGKey(s[()] if hasattr(s, "shape") else s), (CAP,))
        return jax.lax.sort(k, is_stable=False).astype(jnp.float32)[::1024].sum()

    def radix_pass(s):
        """One 32-bucket stable counting pass: one-hot cumsum rank + iota
        scatter for the inverse permutation."""
        k = jax.random.bits(jax.random.PRNGKey(s[()] if hasattr(s, "shape") else s), (CAP,))
        b = (k & 31).astype(jnp.int32)
        onehot = (b[:, None] == jnp.arange(32, dtype=jnp.int32)[None, :])
        cum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        rank = ((cum - 1) * onehot).sum(axis=1)
        total = cum[-1]
        base = jnp.cumsum(total) - total
        dest = (base[None, :] * onehot).sum(axis=1) + rank
        inv = jnp.zeros((CAP,), jnp.int32).at[dest].set(
            jnp.arange(CAP, dtype=jnp.int32))
        return k[inv].astype(jnp.float32)[::1024].sum()

    def record_gather(s):
        k = jax.random.bits(jax.random.PRNGKey(s[()] if hasattr(s, "shape") else s), (CAP,))
        idx = (k % T).astype(jnp.int32)
        return records_d[idx].sum()

    def iota_scatter(s):
        k = jax.random.bits(jax.random.PRNGKey(s[()] if hasattr(s, "shape") else s), (CAP,))
        dest = (k % CAP).astype(jnp.int32)
        inv = jnp.zeros((CAP,), jnp.int32).at[dest].set(
            jnp.arange(CAP, dtype=jnp.int32), mode="drop")
        return inv.astype(jnp.float32)[::1024].sum()

    timed("pair expansion [T,16]+cumsums", expansion)
    timed("(+) compact scatter T*K", scatter_tk)
    timed("compact via searchsorted", compact_via_repeat)
    timed("lax.sort u32 [cap]", sort_only)
    timed("radix-rank pass (32 buckets)", radix_pass)
    timed("iota scatter [cap]", iota_scatter)
    timed("record gather [cap,32]", record_gather)


if __name__ == "__main__":
    main()
