"""Sparse (compacted) per-pixel work — the TPU analog of divergent
per-fragment branches.

On a GPU, a shader branch taken by 5% of fragments costs ~5%; on TPU,
dense masked work costs 100% regardless of the mask. The TPU-native
equivalent is *compaction*: gather the masked pixels into a short flat
array (cost ~ one cumsum + one scatter + per-field row gathers), run the
expensive path on the compacted [CAP] array (cost scales with CAP, not
H*W), and scatter results back.

Used by the per-sample MSAA edge resolve (the counterpart of the
reference's ResolveMSAA averaging 4 shaded samples,
Shaders/DepthResolve.hlsl + SceneRendering.cpp:2060): edge pixels are a
few percent of the frame, so shading their secondary triangle costs a few
percent of a full shade pass instead of doubling it.

Cost model (docs/ARCHITECTURE.md "TPU gather cost model"): the cumsum is
~free (memory-bound); the scatter and the per-field gathers are ~2 ms per
284k random accesses, and 4-wide row gathers amortize ~3x better than
scalars.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_indices(mask: jnp.ndarray, cap: int, block: int = 1):
    """mask [H, W] (or any shape) -> (idx [cap] int32 flat indices of True
    elements in raster order, count scalar clamped to cap, demand scalar =
    TRUE count before clamping). Slots past `count` hold index 0 (callers
    must mask results by lane < count). Overflow truncates; demand > cap
    detects saturation — surface it (ops get a `telemetry` dict) so the
    degraded-quality fallback is never silent (the loud-failure contract
    raster binning has; a GPU never silently drops fragments).

    block > 1 compacts raster-order BLOCKS of `block` elements whose mask
    is anywhere-True instead of single elements. The compaction scatter —
    the dominant cost, ~2 ms per 284k source elements (BASELINE.md cost
    model; it is a full-N scatter even when few are True) — shrinks by
    `block`x: ~14 ms -> ~2 ms at 1080p with block=8. The price: lanes of
    a live block whose own mask is False occupy slots (callers mask per
    lane by `lane < count & mask[idx]`), so effective capacity drops by
    the block occupancy factor (~0.4-0.8 for spatially-coherent masks —
    edges, grazing floors). count/demand stay in ELEMENT units
    (block-count x block) so cap sizing and saturation telemetry keep
    their meaning. cap must be a multiple of block."""
    flat = mask.reshape(-1)
    n = flat.shape[0]
    if block > 1:
        assert cap % block == 0, (cap, block)
        capb = cap // block
        if mask.ndim == 2 and mask.shape[1] % block == 0:
            # 2-D path: [H, W/B, B] minor-axis reduce — the same shape
            # class as pool2's measured-free reshape+reduce. Reshaping
            # the 1-D flat mask to [N/B, B] instead RELAYOUTS (lanes ->
            # sublanes): measured +15.6 ms/frame on the bench anchor.
            h, w = mask.shape
            any_blk = mask.reshape(h, w // block, block).any(axis=2) \
                .reshape(-1)
            nb = any_blk.shape[0]
        else:
            if n % block:
                flat = jnp.pad(flat, (0, block - n % block))
            nb = flat.shape[0] // block
            any_blk = flat.reshape(nb, block).any(axis=1)
        posb = jnp.cumsum(any_blk.astype(jnp.int32)) - 1
        demand = (posb[-1] + 1) * block
        count = jnp.minimum(demand, cap)
        destb = jnp.where(any_blk, posb, capb)
        bidx = jnp.zeros((capb,), jnp.int32).at[destb].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop")
        idx = (bidx[:, None] * block
               + jnp.arange(block, dtype=jnp.int32)[None, :]).reshape(-1)
        idx = jnp.minimum(idx, n - 1)       # padded tail lanes stay in range
        return idx, count, demand
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1          # rank of each True
    demand = pos[-1] + 1
    count = jnp.minimum(demand, cap)
    dest = jnp.where(flat, pos, cap)                      # False -> dropped
    idx = jnp.zeros((cap,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx, count, demand


def block_count(mask: jnp.ndarray, block: int) -> jnp.ndarray:
    """Number of anywhere-True raster-order blocks of `block` elements —
    the demand compact_indices(…, block=block) sees. Uses the 2-D
    minor-axis reduce (free) when the shape allows."""
    if block == 1:
        return mask.sum(dtype=jnp.int32)
    if mask.ndim == 2 and mask.shape[1] % block == 0:
        h, w = mask.shape
        return mask.reshape(h, w // block, block).any(axis=2) \
            .sum(dtype=jnp.int32)
    flat = mask.reshape(-1)
    if flat.shape[0] % block:
        flat = jnp.pad(flat, (0, block - flat.shape[0] % block))
    return flat.reshape(-1, block).any(axis=1).sum(dtype=jnp.int32)


def adaptive_threshold(score: jnp.ndarray, thresholds, cap: int,
                       block: int = 1):
    """Pick the LOWEST threshold in the static ascending ladder whose
    active set (score > t) fits the compaction capacity, counted in
    `block` units — so a capacity-bound refinement pass spends its budget
    on the WORST pixels instead of truncating in raster order (a GPU's
    per-pixel divergent loop has no capacity; this is the TPU-native
    equivalent of its graceful degradation). Returns (thr scalar,
    demand_blocks at thr). If even the top threshold overflows, the top
    one is returned and compact_indices truncates (loud via telemetry)."""
    capb = cap // block
    # reduce the score to per-block MAX once, then count rungs on the
    # reduced array: any(score > t in block) == (max(block) > t), so the
    # ladder's per-rung dense compare+reduce shrinks by `block`x (at 2M
    # source elements and 9 rungs that is 9 full-frame passes -> 9 passes
    # over N/8)
    if block > 1 and score.ndim == 2 and score.shape[1] % block == 0:
        h, w = score.shape
        counted = score.reshape(h, w // block, block).max(axis=2)
        cblock = 1
    else:
        counted = score
        cblock = block
    thr = jnp.float32(thresholds[-1])
    demand = block_count(counted > thresholds[-1], cblock)
    for t in reversed(thresholds[:-1]):
        c = block_count(counted > t, cblock)
        fits = c <= capb
        thr = jnp.where(fits, jnp.float32(t), thr)
        demand = jnp.where(fits, c, demand)
    return thr, demand


def gather_pixels(img: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """img [H, W] or [H, W, C] -> [cap] or [cap, C] rows at flat indices."""
    if img.ndim == 2:
        return img.reshape(-1)[idx]
    return img.reshape(-1, img.shape[-1])[idx]


def scatter_pixels(img: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray,
                   live: jnp.ndarray) -> jnp.ndarray:
    """Write vals [cap(,C)] back into img [H, W(,C)] at flat indices where
    live [cap] is True (dead lanes scatter to a dropped out-of-range slot
    so padding never clobbers pixel 0)."""
    shape = img.shape
    if img.ndim == 3:
        flat = img.reshape(-1, shape[-1])
    else:
        flat = img.reshape(-1)
    n = flat.shape[0]
    dest = jnp.where(live, idx, n)
    return flat.at[dest].set(vals, mode="drop").reshape(shape)
