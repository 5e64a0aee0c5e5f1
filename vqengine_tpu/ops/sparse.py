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


def compact_indices(mask: jnp.ndarray, cap: int):
    """mask [H, W] (or any shape) -> (idx [cap] int32 flat indices of True
    elements in raster order, count scalar clamped to cap, demand scalar =
    TRUE count before clamping). Slots past `count` hold index 0 (callers
    must mask results by lane < count). Overflow truncates; demand > cap
    detects saturation — surface it (ops get a `telemetry` dict) so the
    degraded-quality fallback is never silent (the loud-failure contract
    raster binning has; a GPU never silently drops fragments)."""
    flat = mask.reshape(-1)
    n = flat.shape[0]
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1          # rank of each True
    demand = pos[-1] + 1
    count = jnp.minimum(demand, cap)
    dest = jnp.where(flat, pos, cap)                      # False -> dropped
    idx = jnp.zeros((cap,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return idx, count, demand


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
