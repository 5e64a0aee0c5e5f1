"""Per-sample MSAA edge resolve — the counterpart of the reference's
ResolveMSAA pass averaging 4 shaded samples (Shaders/DepthResolve.hlsl,
SceneRendering.cpp:2060 ResolveMSAA) built TPU-first.

The G-buffer raster kernel keeps ONE min-depth winner per pixel plus
per-sample sticky coverage: shading stays a single dense pass (the
shade-once economics the reference's resolve also banks on for depth).
What that loses is triangle-triangle edges — pixels whose 4 samples split
between two surfaces resolved to the winner at full weight. This module
closes that gap WITHOUT growing the hot kernel:

1. **Detect** edge pixels: the winner id differs from a 4-neighbor's and
   the surfaces genuinely differ (object id change or a depth gap) — the
   edges the reference's per-sample resolve visibly improves
   (interpenetrations, silhouettes over other geometry). Same-mesh
   interior edges interpolate continuously and are skipped.
2. **Compact** them (ops/sparse.py): edge pixels are a few percent of the
   frame, so everything downstream costs a few percent of a dense pass.
3. **Re-evaluate visibility per sample** in plain jnp: the candidate set
   for a pixel's samples is {own winner} ∪ {4-neighbor winners} — their
   packed records' edge/depth planes (raster.eval_record_planes, exactly
   the kernel's coverage test) decide which candidate wins each D3D 4x
   sample. Sub-pixel slivers that win a sample but no neighboring pixel
   center are the only misses.
4. The caller sparse-shades ONE secondary surface per edge pixel and
   blends by exact sample counts (render_forward).

Cost model (docs/ARCHITECTURE.md "TPU gather cost model"): 5 record-row
gathers + a handful of [CAP, 5] VPU ops; at CAP = 64k that is well under
a millisecond, vs ~4x the full shade cost for true per-sample shading.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import raster
from . import sparse

# NDC-depth gap above which two adjacent winners count as distinct
# surfaces (silhouette-over-geometry edges); interpenetrating different
# objects are caught by the object-id test regardless of gap.
EDGE_Z_TOL = 2e-3


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Neighbor image with edge-clamped borders (pad + slice, not index
    gathers — affine [H]/[W] index gathers can lower as real gathers and
    relayout the lane axis on TPU)."""
    h, w = img.shape[:2]
    pads = ((max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0)))
    pads = pads + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pads, mode="edge")
    return p[max(dy, 0):max(dy, 0) + h, max(dx, 0):max(dx, 0) + w]


NEIGHBOR_OFFSETS = ((0, 1), (0, -1), (1, 0), (-1, 0))


def detect_edge_score(tri_id: jnp.ndarray, depth: jnp.ndarray,
                      object_id: jnp.ndarray, mask: jnp.ndarray,
                      z_tol: float = EDGE_Z_TOL) -> jnp.ndarray:
    """[H,W] float in {0..4}: how many of a pixel's 4 neighbors hold a
    DISTINCT surface (different triangle of a different object, or across
    a depth discontinuity). 0 = not an edge pixel. The count is the
    capacity-ladder score for the edge resolve: pixels where more samples
    can split (interpenetrations, 2-sided silhouettes) outrank single-
    neighbor silhouette fringes when the compaction budget is short."""
    score = jnp.zeros(tri_id.shape, jnp.float32)
    for dy, dx in NEIGHBOR_OFFSETS:
        nb_id = _shift(tri_id, dy, dx)
        nb_obj = _shift(object_id, dy, dx)
        nb_z = _shift(depth, dy, dx)
        nb_mask = _shift(mask, dy, dx)
        differs = (nb_id != tri_id) & nb_mask & (
            (nb_obj != object_id) | (jnp.abs(nb_z - depth) > z_tol))
        score = score + differs.astype(jnp.float32)
    return jnp.where(mask, score, 0.0)


def detect_edges(tri_id: jnp.ndarray, depth: jnp.ndarray,
                 object_id: jnp.ndarray, mask: jnp.ndarray,
                 z_tol: float = EDGE_Z_TOL) -> jnp.ndarray:
    """[H,W] bool: pixels whose 4 MSAA samples may split between two
    DISTINCT surfaces (any neighbor distinct — see detect_edge_score)."""
    return detect_edge_score(tri_id, depth, object_id, mask, z_tol) > 0.5


# capacity ladder for the edge compaction: rung k keeps pixels with MORE
# than k distinct neighbors; the top rung (4.0) is all-False (score <= 4
# by construction) — a guaranteed-satisfiable "resolve nothing" floor
# where every pixel keeps the min-depth winner at full weight (exactly
# the msaa_edge_resolve=False look). Without it a frame with more edge
# blocks than cap MUST truncate in raster order (the failure class
# tests/test_capacity.py reproduces at quarter res, where silhouette
# length/area grows vs 1080p).
EDGE_THRS = (0.5, 1.5, 2.5, 3.5, 4.0)


def resolve_secondary(records: jnp.ndarray, tri_id: jnp.ndarray,
                      depth: jnp.ndarray, object_id: jnp.ndarray,
                      mask: jnp.ndarray, cov_s: jnp.ndarray,
                      cap: int, pad: int = 0,
                      telemetry: dict | None = None):
    """Per-sample visibility at edge pixels.

    records [T,R] packed gbuf records; tri_id/depth/object_id/mask [H,W];
    cov_s [4,H,W] per-sample sticky any-triangle coverage from the kernel.

    pad > 0: tri_id/depth/object_id/mask carry `pad` halo rows top+bottom
    (the multichip band renderer's ppermute exchange) so edge detection and
    neighbor candidates at band seams see the adjacent band exactly like
    the single-chip frame; cov_s and the returned indices stay interior
    ([4,H,W] / flat into H*W).

    Returns (idx [cap] flat pixel indices, live [cap] bool,
    sec_id [cap] int32 secondary winner (own id where none),
    n_sec [cap] f32 in 0..4 samples the secondary wins,
    px, py [cap] pixel-center coords). Samples whose best candidate is
    the own winner (or that no candidate covers while the scene does —
    unknown sub-pixel sliver) stay with the primary."""
    def interior(img):
        return img[pad:img.shape[0] - pad] if pad else img

    h, w = interior(tri_id).shape
    score = interior(detect_edge_score(tri_id, depth, object_id, mask))
    # capacity-aware activation (EDGE_THRS): the resolve budget goes to
    # the pixels with the most distinct neighbors; past-capacity frames
    # degrade to winner-takes-all on the weakest edges instead of
    # truncating in raster order
    thr, _db = sparse.adaptive_threshold(score, EDGE_THRS, cap, block=8)
    edge = score > thr
    # block=8: edge pixels run along silhouettes, so 8-lane raster blocks
    # stay ~half full while the compaction scatter (the pass's dominant
    # cost, ~14 ms at 1080p dense) shrinks 8x
    idx, count, demand = sparse.compact_indices(edge, cap, block=8)
    if telemetry is not None:
        # chosen-rung saturation (<= 1 by the all-False top rung) +
        # informational base-rung demand (engine telemetry, not asserted)
        telemetry["msaa_edges"] = demand.astype(jnp.float32) / cap
        telemetry["msaa_edges_demand"] = sparse.block_count(
            score > EDGE_THRS[0], 8).astype(jnp.float32) * 8 / cap
    live = sparse.gather_pixels(edge, idx) & (jnp.arange(cap) < count)

    own = sparse.gather_pixels(interior(tri_id), idx)         # [cap]
    cands = [own]
    for dy, dx in NEIGHBOR_OFFSETS:
        cands.append(sparse.gather_pixels(
            interior(_shift(tri_id, dy, dx)), idx))
    cand_ids = jnp.stack(cands, axis=1)                       # [cap, 5]
    valid_c = cand_ids >= 0
    # FLAT 1-D row gather only: a [cap,5]-indexed gather with a sliced
    # minor dim misses the TPU fast gather path and can lower serialized
    # (measured as the r3 bench regression's +843 ms/frame)
    rec13 = records[:, :13][jnp.maximum(cand_ids, 0).reshape(-1)] \
        .reshape(cap, cand_ids.shape[1], 13)                  # [cap, 5, 13]

    px = (idx % w).astype(jnp.float32) + 0.5
    py = (idx // w).astype(jnp.float32) + 0.5

    # per-plane flat gathers (an axis-1 batched gather is NOT the fast
    # path; see rec13 note)
    covs = jnp.stack([cov_s[s].reshape(-1)[idx]
                      for s in range(cov_s.shape[0])])        # [4, cap]
    n_sec = jnp.zeros_like(px)
    sec_z = jnp.full_like(px, 2.0)
    sec_id = own
    for s, (dx, dy) in enumerate(raster.MSAA4_OFFSETS):
        sx = (px + dx)[:, None]
        sy = (py + dy)[:, None]
        b0, b1, b2, z = raster.eval_record_planes(rec13, sx, sy)
        cover = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)
                 & (z >= 0) & (z <= 1) & valid_c)             # [cap, 5]
        key = jnp.where(cover, z, 2.0)
        # min + where-chain select: take_along_axis on the minor axis is
        # a lane-dimension gather, catastrophically slow on TPU (the
        # documented ~100 ms/call pathology, ops/shadow.py:143)
        best = jnp.argmin(key, axis=1)
        bz = jnp.min(key, axis=1)
        bid = cand_ids[:, 0]
        for j in range(1, cand_ids.shape[1]):
            bid = jnp.where(best == j, cand_ids[:, j], bid)
        is_sec = (covs[s] > 0) & (bz < 2.0) & (bid != own)
        n_sec = n_sec + is_sec.astype(jnp.float32)
        take = is_sec & (bz < sec_z)
        sec_z = jnp.where(take, bz, sec_z)
        sec_id = jnp.where(take, bid, sec_id)
    return idx, live & (n_sec > 0), sec_id, n_sec, px, py
