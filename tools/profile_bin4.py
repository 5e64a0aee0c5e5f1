"""Fine-grained decomposition of _bin_one_axis (fine tier, bench-scene
sizes): times cumulative prefixes of the exact pipeline so deltas give
each primitive's in-context cost (the bin3 micros summed to ~12 of the
measured 18.4 ms — find the rest). Run alone on the TPU."""
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

    from vqengine_tpu.ops import raster
    from vqengine_tpu.ops.raster import GROUP, cdiv

    T = cdiv(285000, GROUP) * GROUP
    nt = 1020          # 15 x 68 tiles
    cap = T
    n = 16
    rng = np.random.default_rng(0)

    # realistic-ish inputs: ~55% live triangles, covers 1-4 tiles
    live = jnp.asarray(rng.random(T) < 0.55)
    ncover = jnp.asarray(rng.integers(1, 5, T).astype(np.int32))
    nc = jnp.where(live, ncover, 0)
    tx0 = jnp.asarray(rng.integers(0, 14, T).astype(np.int32))
    ty0 = jnp.asarray(rng.integers(0, 67, T).astype(np.int32))
    sw = jnp.asarray(rng.integers(1, 3, T).astype(np.int32))
    tri_cols = jnp.stack([tx0, ty0, sw], axis=1)
    records = jnp.asarray(rng.random((T, 32)).astype(np.float32))

    tiles_x = 15

    def fine_bin(rowp, k):
        sww = jnp.maximum(rowp[:, 2], 1)
        q = jnp.floor((k.astype(jnp.float32) + 0.5)
                      / sww.astype(jnp.float32)).astype(jnp.int32)
        return (rowp[:, 1] + q) * tiles_x + rowp[:, 0] + (k - q * sww)

    def prefix(stage, s):
        """Run _bin_one_axis internals up to `stage`, perturbed by s."""
        ncs = jnp.where(live, jnp.minimum(ncover + (s % 2), 4), 0)
        t = T
        nbins = nt
        offs = jnp.cumsum(ncs) - ncs
        lv = ncs > 0
        if stage == "cumsum_offs":
            return offs.sum().astype(jnp.float32)
        fill = jnp.full((cap,), jnp.int32(-1))
        fill = fill.at[jnp.where(lv, offs, cap)].set(
            jnp.arange(t, dtype=jnp.int32), mode="drop")
        t_of_p = jax.lax.cummax(fill, axis=0)
        t_safe = jnp.maximum(t_of_p, 0)
        if stage == "fill":
            return t_safe.sum().astype(jnp.float32)
        rows = jnp.concatenate([tri_cols, ncs[:, None], offs[:, None]],
                               axis=1)
        rowp = rows[t_safe]
        k_of_p = jnp.arange(cap, dtype=jnp.int32) - rowp[:, -1]
        pair_live = (t_of_p >= 0) & (k_of_p < rowp[:, -2])
        bin_p = jnp.where(pair_live, fine_bin(rowp, k_of_p), nbins)
        if stage == "binp":
            return bin_p.sum().astype(jnp.float32)
        bits = max(2, int(np.ceil(np.log2(nbins + 2))))
        lo_bits = bits // 2
        hi_bits = bits - lo_bits
        packed = (bin_p.astype(jnp.uint32) << 20) | t_safe.astype(jnp.uint32)
        packed = raster._radix_rank_pass(
            (bin_p & ((1 << lo_bits) - 1)).astype(jnp.int32), packed,
            1 << lo_bits)
        if stage == "radix1":
            return packed.astype(jnp.float32).sum()
        packed = raster._radix_rank_pass(
            ((packed >> (20 + lo_bits))
             & jnp.uint32((1 << hi_bits) - 1)).astype(jnp.int32),
            packed, 1 << hi_bits)
        if stage == "radix2":
            return packed.astype(jnp.float32).sum()
        sorted_bins = (packed >> 20).astype(jnp.int32)
        tri_of_pair = (packed & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        if stage == "unpack":
            return (sorted_bins + tri_of_pair).astype(jnp.float32).sum()
        pair_records = jnp.where((sorted_bins < nbins)[:, None],
                                 records[jnp.minimum(tri_of_pair, t - 1)],
                                 raster._killed_record(records.shape[1]))
        if stage == "recgather":
            return pair_records.sum()
        blocks = raster._group_blocks(pair_records)
        if stage == "blocks":
            return blocks.sum()
        starts = jnp.searchsorted(
            sorted_bins, jnp.arange(nbins + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        return blocks.sum() + starts.sum().astype(jnp.float32)

    @jax.jit
    def nop(t):
        return t + 1

    def timed(name, fn):
        seeds = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def run(seeds):
            def step(c, s):
                return c + fn(s), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), seeds)
            return tot

        _ = np.asarray(run(seeds))
        # floor: min of several nop round trips (mean gets polluted by
        # post-compile hiccups — the negative-row artifact in bin3)
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(nop(jnp.zeros(4)))
            samples.append(time.perf_counter() - t0)
        floor = min(samples)
        t0 = time.perf_counter()
        _ = np.asarray(run(seeds))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:28s} {ms:8.2f} ms", flush=True)

    for stage in ("cumsum_offs", "fill", "binp", "radix1", "radix2",
                  "unpack", "recgather", "blocks", "full"):
        timed(f"fine tier -> {stage}", lambda s, st=stage: prefix(st, s))


if __name__ == "__main__":
    main()
