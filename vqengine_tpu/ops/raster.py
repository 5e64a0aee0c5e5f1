"""TPU tile rasterizer — the replacement for the reference's entire D3D12
draw-call path (input assembler, vertex shader dispatch, rasterizer, depth
test; driven by SceneRendering.cpp:1265-1851 and the shadow/depth passes).

Design (TPU-first, not a GPU translation):

1.  **Vertex transform** is a batched matvec over all vertices (MXU/VPU).
2.  **Triangle setup** builds *clipless homogeneous edge functions*
    (Olano & Greer, "Triangle Scan Conversion using 2D Homogeneous
    Coordinates"): for screen-homogeneous vertices c_i = (Xs, Ys, w),
    e_i = cross(c_j, c_k). A pixel p = (px, py, 1) is covered iff all
    b_i = e_i . p >= 0 (for det > 0 front faces), and any vertex attribute
    interpolates perspective-correctly as  u(p) = sum(b_i u_i) / sum(b_i).
    Depth z_ndc(p) = sum(b_i * z_i) / det.  No near-plane clipping is ever
    needed; triangles crossing w=0 rasterize only their visible part.
3.  **Binning**: each triangle emits (tile, tri) pairs for the screen tiles
    its bbox covers (capped at K_MAX; bigger or near-plane-crossing
    triangles go to a small per-frame "global" list processed by every
    tile). Pairs are sorted by tile id — one jnp.argsort — giving
    contiguous per-tile segments, and per-pair setup records are
    pre-gathered so the raster kernel only does *contiguous* DMA.
4.  **Raster kernel (Pallas)**: grid over screen tiles; each tile streams
    its pair records HBM->VMEM in chunks and evaluates coverage + depth
    test over the whole [TILE_H, TILE_W] pixel block on the VPU,
    maintaining (min z, winning triangle id) — a visibility buffer.
5.  **Attribute resolve** (XLA): per-pixel gather of the winning triangle's
    edge rows + vertex attributes, then the barycentric blend from (2).

The depth buffer convention matches D3D: clear to 1.0, test LESS,
z in [0, 1]; screen y points down; front faces wind clockwise on screen
(det > 0 in our orientation).
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._backend import pallas_call

# tile size: one VREG of lanes wide, 16 sublane rows tall. Kernel VPU work
# scales with (pairs x NPX); the mean triangle covers ~7 px at stress-scene
# density, so smaller tiles cut wasted coverage tests ~2x while pair counts
# barely grow (a 7 px triangle still covers 1-2 tiles either way).
TILE_H = 16
TILE_W = 128
# triangles per DMA'd group block. Segment bounds round out to whole
# groups, so at low pair demand the kernel's floor is ~tiles * GROUP
# evaluated slots — a smaller group trades DMA row width (GROUP * 4 B)
# for less rounding waste. Env-tunable for the A/B ladder
# (tools/profile_r5grp.py); 128 = one full lane vector.
GROUP = int(os.environ.get("VQE_GROUP", "128"))
PAIR_ROWS = 16        # rows per group block: e0(3) e1(3) e2(3) dp(3) id(1) pad(3)
K_MAX_DEFAULT = 16    # max tiles a binned triangle may cover (16px-tall
#                       tiles double the vertical span of mid-size tris)
GLOBAL_CAP = 512      # capacity of the per-frame big-triangle list
BG_ID = -1            # background triangle id


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ===========================================================================
# 1+2. vertex transform & triangle setup (dense XLA)
# ===========================================================================

def transform_clip(positions: jnp.ndarray, mvp: jnp.ndarray) -> jnp.ndarray:
    """positions [V,3] x column-convention mvp [4,4] -> clip [V,4]."""
    p = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=1)
    return p @ mvp.T


def transform_clip_corners(corner_positions: jnp.ndarray,
                           tri_item: jnp.ndarray,
                           mvps: jnp.ndarray) -> jnp.ndarray:
    """corner_positions [3T, 3] (static positions[indices] table),
    tri_item [T] int32, mvps [N,4,4] -> clip corners [T, 3, 4].

    Per-corner storage removes the per-frame clip[indices] gather from
    triangle setup (vertex indices are static, so the gather was pure
    waste: ~25 ms at 283k tris on TPU); the per-corner matrix fetch is a
    palette-kernel MXU matmul, not a gather."""
    from .palette import palette_lookup
    t = tri_item.shape[0]
    n = mvps.shape[0]
    item3 = jnp.repeat(tri_item, 3, total_repeat_length=3 * t)
    m = palette_lookup(item3, mvps.reshape(n, 16)).reshape(-1, 4, 4)
    p = jnp.concatenate(
        [corner_positions, jnp.ones_like(corner_positions[:, :1])], axis=1)
    return jnp.einsum("cij,cj->ci", m, p).reshape(t, 3, 4)


def transform_clip_corners_morph(corner_positions: jnp.ndarray,
                                 corner_morph_mid: jnp.ndarray,
                                 tri_item: jnp.ndarray,
                                 mvps: jnp.ndarray,
                                 morph_w: jnp.ndarray) -> jnp.ndarray:
    """transform_clip_corners with on-device continuous tessellation:
    positions lerp toward their geomorph targets by the per-item factor
    morph_w [N] in [0,1] (1 = full fine detail) BEFORE the clip transform
    — the domain-shader evaluation of Tessellation.hlsl's distance-based
    factors, done as one fused elementwise pass over the corner table.
    The factor rides the same palette row as the matrix (one MXU lookup,
    zero extra gathers); meshes without morph data carry mid == position,
    so the lerp is a no-op for them regardless of the factor."""
    from .palette import palette_lookup
    t = tri_item.shape[0]
    n = mvps.shape[0]
    item3 = jnp.repeat(tri_item, 3, total_repeat_length=3 * t)
    table = jnp.concatenate([mvps.reshape(n, 16),
                             morph_w.astype(jnp.float32)[:, None]], axis=1)
    rows = palette_lookup(item3, table)                       # [3T, 17]
    m = rows[:, :16].reshape(-1, 4, 4)
    w = rows[:, 16:17]
    pos = corner_morph_mid + w * (corner_positions - corner_morph_mid)
    p = jnp.concatenate([pos, jnp.ones_like(pos[:, :1])], axis=1)
    return jnp.einsum("cij,cj->ci", m, p).reshape(t, 3, 4)


def transform_clip_instanced(positions: jnp.ndarray, item_of_vertex: jnp.ndarray,
                             mvps: jnp.ndarray) -> jnp.ndarray:
    """positions [V,3], item_of_vertex [V] int32, mvps [N,4,4] -> clip [V,4].
    The per-draw-item WVP lookup replaces the reference's per-instance
    constant-buffer indexing (ForwardLighting.hlsl:119-124); the matrix
    fetch runs through the palette kernel (XLA row gathers cost ~1
    element/cycle)."""
    from .palette import palette_lookup
    n = mvps.shape[0]
    m = palette_lookup(item_of_vertex, mvps.reshape(n, 16)).reshape(-1, 4, 4)
    p = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=1)
    return jnp.einsum("vij,vj->vi", m, p)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TriangleSetup:
    """Per-triangle raster data (all [T, ...]).

    edges9 stores the homogeneous edge rows flattened
    (e0x,e0y,e0w, e1x,..., e2w): the setup math runs on [T] component
    planes (full 128-lane vectorization; [T,3,3]-shaped arithmetic runs at
    3/128 lane utilization — measured 12 ms/frame at 284k triangles) and
    only the final table materializes."""
    edges9: jnp.ndarray      # [T, 9] homogeneous edge rows (w-scaled)
    zc: jnp.ndarray          # [T, 3] z_i / det (depth plane coefficients)
    vert_scale: jnp.ndarray  # [T, 3] the 1/|w_i| conditioning scales; resolve
    #                          multiplies b'_i by these to recover true
    #                          perspective barycentric weights
    valid: jnp.ndarray       # [T] bool — front-facing & on-screen
    tile_lo: jnp.ndarray     # [T, 2] (tx0, ty0) int32
    tile_hi: jnp.ndarray     # [T, 2] (tx1, ty1) int32 inclusive
    big: jnp.ndarray         # [T] bool — route to the global list


def setup_triangles(clip: jnp.ndarray, indices: jnp.ndarray | None,
                    width: int, height: int,
                    tri_mask: jnp.ndarray | None = None,
                    full_height: int | None = None,
                    y_offset: jnp.ndarray | int = 0) -> TriangleSetup:
    """clip [V,4] (x,y,z,w D3D clip space) + indices [T,3], or pre-gathered
    clip corners [T,3,4] with indices=None (transform_clip_corners path —
    avoids the per-frame clip[indices] gather) -> TriangleSetup.
    tri_mask [T] bool optionally deactivates triangles (culled items,
    non-selected LOD levels).

    For multi-chip screen-band sharding: full_height is the whole
    framebuffer height while `height` is this band's height and y_offset
    its first row — the viewport transform shifts by y_offset*w (linear in
    w, so all edge/interp math stays exact)."""
    if full_height is None:
        full_height = height
    c = clip if indices is None else clip[indices]   # [T,3,4]
    # SoA component planes ([T] each): every op below runs fully
    # lane-vectorized; the previous [T,3,3] formulation kept only 3 of 128
    # lanes busy and cost 12 ms/frame at 284k triangles
    x = [c[:, i, 0] for i in range(3)]
    y = [c[:, i, 1] for i in range(3)]
    z = [c[:, i, 2] for i in range(3)]
    w = [c[:, i, 3] for i in range(3)]
    # screen-homogeneous coords (pixel units, y down; band-local), then
    # condition: scale each vertex by 1/|w| (positive scale keeps signs,
    # barycentric ratios, and z/det invariant)
    s, xs, ys, ws, zs = [], [], [], [], []
    xs_u, ys_u = [], []
    for i in range(3):
        si = 1.0 / jnp.maximum(jnp.abs(w[i]), 1e-9)
        xsi = (x[i] * 0.5 + w[i] * 0.5) * width
        ysi = (-y[i] * 0.5 + w[i] * 0.5) * full_height - y_offset * w[i]
        s.append(si)
        xs_u.append(xsi)
        ys_u.append(ysi)
        xs.append(xsi * si)
        ys.append(ysi * si)
        ws.append(w[i] * si)
        zs.append(z[i] * si)

    def cross(a, b):
        """(x, y, w)-homogeneous cross of two vertex index tuples."""
        return (ys[a] * ws[b] - ws[a] * ys[b],
                ws[a] * xs[b] - xs[a] * ws[b],
                xs[a] * ys[b] - ys[a] * xs[b])

    e0 = cross(1, 2)
    e1 = cross(2, 0)
    e2 = cross(0, 1)
    det = xs[0] * e0[0] + ys[0] * e0[1] + ws[0] * e0[2]

    front = det > 1e-14
    inv_det = jnp.where(front, 1.0 / jnp.where(front, det, 1.0), 0.0)
    zc = [zs[i] * inv_det for i in range(3)]

    # screen bbox. Near-plane crossers (mixed w signs) get an EXACT bbox
    # by clipping against w = eps in homogeneous space: the visible part
    # of the triangle is a bounded convex polygon whose projection is the
    # hull of (vertices with w > eps) + (edge intersections at w = eps) —
    # so every triangle bins through the normal tile tiers. (The old
    # design routed crossers to a GLOBAL_CAP=512 list streamed by every
    # tile: scenes whose camera sits inside large geometry overflow it —
    # the Sponza hall has ~1069 crossers — silently dropping walls.)
    eps = 1e-5
    w_ok = [w[i] > eps for i in range(3)]
    any_ok = w_ok[0] | w_ok[1] | w_ok[2]
    all_w_pos = w_ok[0] & w_ok[1] & w_ok[2]
    BIG = jnp.float32(1e9)
    cand_x, cand_y, cand_ok = [], [], []
    for i in range(3):
        cand_x.append(xs[i] / jnp.where(ws[i] != 0, ws[i], 1.0))
        cand_y.append(ys[i] / jnp.where(ws[i] != 0, ws[i], 1.0))
        cand_ok.append(w_ok[i])
    for a, b in ((0, 1), (1, 2), (2, 0)):
        cross_e = w_ok[a] != w_ok[b]
        denom = w[b] - w[a]
        t = (eps - w[a]) / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
        xh = xs_u[a] + t * (xs_u[b] - xs_u[a])
        yh = ys_u[a] + t * (ys_u[b] - ys_u[a])
        cand_x.append(xh / eps)
        cand_y.append(yh / eps)
        cand_ok.append(cross_e)
    xmin = xmax = ymin = ymax = None
    for cx, cy, ok in zip(cand_x, cand_y, cand_ok):
        lo_x = jnp.where(ok, cx, BIG)
        hi_x = jnp.where(ok, cx, -BIG)
        lo_y = jnp.where(ok, cy, BIG)
        hi_y = jnp.where(ok, cy, -BIG)
        xmin = lo_x if xmin is None else jnp.minimum(xmin, lo_x)
        xmax = hi_x if xmax is None else jnp.maximum(xmax, hi_x)
        ymin = lo_y if ymin is None else jnp.minimum(ymin, lo_y)
        ymax = hi_y if ymax is None else jnp.maximum(ymax, hi_y)
    # a pixel of slack absorbs f32 rounding of the extreme clip ratios
    pad = jnp.where(all_w_pos, 0.0, 1.0)
    xmin, xmax = xmin - pad, xmax + pad
    ymin, ymax = ymin - pad, ymax + pad

    offscreen = (xmax < 0) | (xmin >= width) | (ymax < 0) | (ymin >= height)
    valid = front & any_ok & ~offscreen
    if tri_mask is not None:
        valid = valid & tri_mask
    big = jnp.zeros_like(valid)     # the global tier is no longer needed

    tiles_x = cdiv(width, TILE_W)
    tiles_y = cdiv(height, TILE_H)
    tx0 = jnp.clip(jnp.floor(xmin / TILE_W).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / TILE_W).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / TILE_H).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / TILE_H).astype(jnp.int32), 0, tiles_y - 1)
    return TriangleSetup(
        edges9=jnp.stack([e0[0], e0[1], e0[2], e1[0], e1[1], e1[2],
                          e2[0], e2[1], e2[2]], axis=1),
        zc=jnp.stack(zc, axis=1),
        vert_scale=jnp.stack(s, axis=1), valid=valid,
        tile_lo=jnp.stack([tx0, ty0], axis=1),
        tile_hi=jnp.stack([tx1, ty1], axis=1),
        big=big,
    )


def _pack_records(setup: TriangleSetup,
                  extra: jnp.ndarray | None = None) -> jnp.ndarray:
    """[T, R] f32 records: e'0(3) | e'1(3) | e'2(3) | dp(3) | tri_id(1,
    exact float up to 2^24) | extra columns (G-buffer mode: per-vertex
    attributes + ids), padded to a multiple of 8 rows.

    The per-vertex 1/|w| conditioning scales are FOLDED into the edge rows
    (e'_i = s_i * e_i): coverage signs are invariant under a positive
    per-row scale, and b'_i = s_i * b_i is directly the unnormalized
    perspective barycentric weight — so records carry 3 fewer rows and the
    kernel skips the per-group scale broadcasts (binning gather cost and
    kernel VPU work both scale with record rows).

    dp is the pre-combined depth plane (sum_i zc_i * e_i, UNscaled edges)
    so the kernel evaluates z_ndc with a single plane equation.

    Records are *self-validating*: invalid triangles (back-facing,
    off-screen) are replaced by a killed record whose coverage test can
    never pass (e'0 = (0,0,-1)). The raster kernel therefore needs no
    per-lane validity masking and group-aligned overreads are safe.
    """
    t = setup.edges9.shape[0]
    tid = jnp.arange(t, dtype=jnp.float32)
    # SoA column math (see TriangleSetup.edges9): scaled edges + the
    # pre-combined depth plane, each a full-lane [T] op
    e9, zc, vs = setup.edges9, setup.zc, setup.vert_scale
    cols = [e9[:, 3 * k + j] * vs[:, k] for k in range(3) for j in range(3)]
    cols += [zc[:, 0] * e9[:, j] + zc[:, 1] * e9[:, 3 + j]
             + zc[:, 2] * e9[:, 6 + j] for j in range(3)]
    parts = [jnp.stack(cols, axis=1).astype(jnp.float32), tid[:, None]]
    if extra is not None:
        parts.append(extra.astype(jnp.float32))
    rec = jnp.concatenate(parts, axis=1)
    rows = cdiv(rec.shape[1], 8) * 8
    if rows > rec.shape[1]:
        rec = jnp.pad(rec, ((0, 0), (0, rows - rec.shape[1])))
    return jnp.where(setup.valid[:, None], rec, _killed_record(rows))


def _killed_record(rows: int = PAIR_ROWS) -> jnp.ndarray:
    k = np.zeros((rows,), dtype=np.float32)
    k[2] = -1.0  # e0 = (0, 0, -1): b0 == -1 everywhere -> never covered
    k[12] = float(BG_ID)
    return jnp.asarray(k)


def _group_blocks(records: jnp.ndarray) -> jnp.ndarray:
    """[P, R] -> lane-aligned group blocks [NG, R, GROUP], padding the
    tail with killed records."""
    p, rows = records.shape
    ng = max(1, cdiv(p, GROUP))
    pad = ng * GROUP - p
    if pad:
        records = jnp.concatenate(
            [records, jnp.broadcast_to(_killed_record(rows), (pad, rows))], axis=0)
    return records.reshape(ng, GROUP, rows).transpose(0, 2, 1)


# ===========================================================================
# 3. binning
# ===========================================================================

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BinnedTriangles:
    pairs: jnp.ndarray      # [NG, R, GROUP] sorted per-pair group blocks
    starts: jnp.ndarray     # [NT + 1] int32 segment offsets (pair units)
    # medium tier: triangles spanning more than K_MAX tiles bin per tile
    # ROW, so the kernel evaluates them only for the tiles_x tiles of each
    # covered row instead of every tile (the big floor/wall triangles were
    # costing gcount * NT group evaluations through the global list)
    rpairs: jnp.ndarray     # [NRG, R, GROUP] row-binned group blocks
    rstarts: jnp.ndarray    # [TILES_Y + 1] int32 row-segment offsets
    gpairs: jnp.ndarray     # [NGG, R, GROUP] global (near-plane) blocks
    gmeta: jnp.ndarray      # [2] int32: (gcount, tiles_x)
    overflow: jnp.ndarray   # [3] int32: (pairs, row pairs, globals dropped)
    # measured per-frame pair demand (sum of per-triangle cover counts) —
    # feeds the demand-sized capacity buckets (pair_cap_bucket); demand >
    # pair_cap <=> overflow[0] > 0
    demand: jnp.ndarray | None = None
    tiles_x: int = field(metadata=dict(static=True), default=0)
    tiles_y: int = field(metadata=dict(static=True), default=0)
    pair_cap: int = field(metadata=dict(static=True), default=0)


def _radix_rank_pass(bucket: jnp.ndarray, payload: jnp.ndarray,
                     n_buckets: int) -> jnp.ndarray:
    """One stable counting-sort pass: reorder `payload` by `bucket`
    (values in [0, n_buckets)). Rank-by-cumsum over a [P, B] one-hot.
    Cost model (measured at 284k): the cumsums are ~free (memory-bound);
    the single P-element scatter is the ~2 ms cost — so the payload
    scatters STRAIGHT to its destination (dest is a bijection) instead of
    building an inverse permutation and gathering (2x the random traffic).
    A bitonic lax.sort costs O(P log^2 P) full-array passes."""
    p = bucket.shape[0]
    onehot = (bucket[:, None]
              == jnp.arange(n_buckets, dtype=jnp.int32)[None, :])
    cum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)      # inclusive
    total = cum[-1]
    base = jnp.cumsum(total) - total                        # exclusive
    dest = ((cum - 1 + base[None, :]) * onehot).sum(axis=1)
    return jnp.zeros((p,), payload.dtype).at[dest].set(payload)


def _bin_one_axis(nc: jnp.ndarray, tri_cols: jnp.ndarray,
                  records: jnp.ndarray, cap: int, nbins: int,
                  compute_bin):
    """Generic gather-compaction + radix grouping (see bin_triangles):
    nc [T] = pairs this triangle emits (0 = none); tri_cols [T, C] =
    per-triangle columns compute_bin needs; compute_bin(rowp, k) -> bin
    index for the triangle's k-th pair. Returns (group blocks, starts
    [nbins+1], dropped-pair count)."""
    t = nc.shape[0]
    assert nbins <= 4095, f"{nbins} bins exceed the 12-bit payload field"
    offs = jnp.cumsum(nc) - nc                             # [T] exclusive
    live = nc > 0
    fill = jnp.full((cap,), jnp.int32(-1))
    fill = fill.at[jnp.where(live, offs, cap)].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    t_of_p = jax.lax.cummax(fill, axis=0)                  # [cap]
    t_safe = jnp.maximum(t_of_p, 0)
    # one row gather carries everything pair math needs (tri_cols, nc,
    # offs); a separate offs[t_safe] scalar gather would cost ~2 ms more
    rows = jnp.concatenate([tri_cols, nc[:, None], offs[:, None]], axis=1)
    rowp = rows[t_safe]                                    # [cap, C+2]
    k_of_p = jnp.arange(cap, dtype=jnp.int32) - rowp[:, -1]
    pair_live = (t_of_p >= 0) & (k_of_p < rowp[:, -2])
    bin_p = jnp.where(pair_live, compute_bin(rowp, k_of_p), nbins)

    # payload = (bin, tri) packed; the radix cumsum cost scales with the
    # bucket count, so split ceil(log2(nbins+2)) bits adaptively across
    # the two stable passes (1080p's 1021 bins -> 2x32 buckets, not 2x64);
    # dead pairs carry bin = nbins and sort to the end.
    bits = max(2, int(np.ceil(np.log2(nbins + 2))))
    lo_bits = bits // 2
    hi_bits = bits - lo_bits
    packed = (bin_p.astype(jnp.uint32) << 20) | t_safe.astype(jnp.uint32)
    # ids range [0, t-1], so exactly 2^20 triangles still fit the 20-bit
    # field (StressTest's pow-2-padded buffer lands precisely there)
    assert t <= (1 << 20), f"too many triangles ({t}) for the packed payload"
    packed = _radix_rank_pass(
        (bin_p & ((1 << lo_bits) - 1)).astype(jnp.int32), packed,
        1 << lo_bits)
    packed = _radix_rank_pass(
        ((packed >> (20 + lo_bits))
         & jnp.uint32((1 << hi_bits) - 1)).astype(jnp.int32),
        packed, 1 << hi_bits)

    sorted_bins = (packed >> 20).astype(jnp.int32)         # 4095 for dead
    tri_of_pair = (packed & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
    # pairs beyond a bin's segment are duplicates of other bins' (or
    # killed) records; evaluating them is coverage-safe, so the kernel can
    # round segment bounds out to whole groups.
    pair_records = jnp.where((sorted_bins < nbins)[:, None],
                             records[jnp.minimum(tri_of_pair, t - 1)],
                             _killed_record(records.shape[1]))
    blocks = _group_blocks(pair_records)
    starts = jnp.searchsorted(
        sorted_bins, jnp.arange(nbins + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    dropped = jnp.maximum(nc.sum(dtype=jnp.int32) - cap, 0)
    return blocks, starts, dropped


def bin_triangles(setup: TriangleSetup, width: int, height: int,
                  k_max: int = K_MAX_DEFAULT,
                  pair_capacity: int | None = None,
                  extra: jnp.ndarray | None = None) -> BinnedTriangles:
    """Tile binning, scatter-light and sort-free.

    The round-1 design (compact-scatter of T*K_MAX key slots + one fused
    u32 lax.sort) spent ~25 ms/frame at 283k triangles in the scatter +
    bitonic sort. This formulation replaces both:

    1. **Gather-based compaction.** Pair p's triangle is determined by the
       exclusive cumsum `offs` of per-triangle cover counts: scatter each
       live triangle id to A[offs[t]] (a T-element scatter to unique
       positions) and forward-fill with cummax — t_of_p = fill[p], and the
       slot index k = p - offs[t] enumerates the triangle's covered tiles
       in row-major order. No [T, K] expansion tensors exist at all.
    2. **Two stable radix-rank passes** on the tile id (6 bits each, 4096
       tile bins — covers 2048^2 shadow maps at 16px tiles) group pairs
       into per-tile segments: ranks come from cumsums over [cap, 64]
       one-hots; the only scatters are cap-element iota scatters for the
       inverse permutations (_radix_rank_pass). Pair order within a tile
       ends up (t, k)-sorted — identical to the old fused-key sort, so
       kernel tie-breaking is unchanged.
    """
    tiles_x = cdiv(width, TILE_W)
    tiles_y = cdiv(height, TILE_H)
    nt = tiles_x * tiles_y
    t = setup.edges9.shape[0]
    # fine bins + row bins + the dead-pair sentinel must fit the packed
    # payload's 12-bit bin field (covers 2048^2 shadow maps: 2176 bins)
    assert nt + tiles_y <= 4094, f"{nt}+{tiles_y} bins exceed the 12-bit field"
    if pair_capacity is None:
        # pair work scales with CAPACITY, so keep it tight: T is already
        # bucket-padded above the live triangle count, and live triangles
        # average ~1.3 covered tiles, so cap = T gives ~2.5x headroom;
        # the row-tier share (medium triangles emit span_h pairs each,
        # incl. near-plane crossers) adds t//4 — ~2.5k full-height
        # triangles at 1080p.
        pair_capacity = (max(GROUP, min(t, 4 * 1024 * 1024))
                         + max(8192, t // 4))
    cap_all = cdiv(pair_capacity, GROUP) * GROUP

    records = _pack_records(setup, extra)

    tx0, ty0 = setup.tile_lo[:, 0], setup.tile_lo[:, 1]
    tx1, ty1 = setup.tile_hi[:, 0], setup.tile_hi[:, 1]
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    ncover = span_w * span_h

    # three tiers: per-tile pairs for small triangles, per-tile-ROW pairs
    # for larger on-screen triangles (evaluated by the tiles_x tiles of
    # each covered row), and the global list ONLY for near-plane crossers
    # (no computable bbox).
    small = setup.valid & ~setup.big & (ncover <= k_max)
    medium = setup.valid & ~setup.big & (ncover > k_max)
    big = setup.valid & setup.big
    nc_all = jnp.where(small, ncover,
                       jnp.where(medium, span_h, 0)).astype(jnp.int32)

    # fine and row tiers ride ONE compaction + radix pipeline (measured:
    # the per-pass fixed costs — scatter, cummax fill, row gathers, block
    # transpose — dominate over the bucket-count-proportional cumsum, so
    # one combined pass over cap+cap_r pairs with nt+tiles_y bins beats
    # two separate passes by ~6 ms/frame at 284k tris). Bins 0..nt-1 are
    # per-tile (small tris), nt..nt+tiles_y-1 per tile-row (medium tris);
    # both segment tables slice out of the one sorted array.
    tri_cols = jnp.stack([tx0, ty0, span_w,
                          medium.astype(jnp.int32)], axis=1)   # [T, 4]

    def combined_bin(rowp, k):
        # variable-divisor integer div/mod has no VPU hardware path (it
        # lowers to a long scalar sequence); exact float division covers
        # the k < k_max <= span range (the +0.5 keeps floor() off the
        # representability boundary for small ints)
        sw = jnp.maximum(rowp[:, 2], 1)
        q = jnp.floor((k.astype(jnp.float32) + 0.5)
                      / sw.astype(jnp.float32)).astype(jnp.int32)
        fine = (rowp[:, 1] + q) * tiles_x + rowp[:, 0] + (k - q * sw)
        row = nt + rowp[:, 1] + k
        return jnp.where(rowp[:, 3] > 0, row, fine)

    pairs, starts_all, drop_all = _bin_one_axis(
        nc_all, tri_cols, records, cap_all, nt + tiles_y, combined_bin)
    starts = starts_all[:nt + 1]
    rstarts = starts_all[nt:]
    rpairs = pairs

    # global (near-plane) list: counting-compact ids to the front
    nbig_cum = jnp.cumsum(big.astype(jnp.int32))
    gpos = jnp.where(big, nbig_cum - 1, GLOBAL_CAP)
    glist = jnp.zeros((GLOBAL_CAP,), jnp.int32).at[gpos].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    gcount = jnp.minimum(big.sum(dtype=jnp.int32), GLOBAL_CAP)
    gvalid = jnp.arange(GLOBAL_CAP, dtype=jnp.int32) < gcount
    grecords = jnp.where(gvalid[:, None], records[glist],
                         _killed_record(records.shape[1]))
    gpairs = _group_blocks(grecords)
    gmeta = jnp.stack([gcount, jnp.asarray(tiles_x, jnp.int32)])

    # overflow accounting: pairs beyond the caps never materialize (their
    # offsets fall past the buffer end) and the global list truncates at
    # GLOBAL_CAP — surface dropped counts so callers can assert zero loss.
    nbig = big.sum(dtype=jnp.int32)
    overflow = jnp.stack([drop_all, jnp.zeros_like(drop_all),
                          jnp.maximum(nbig - GLOBAL_CAP, 0)])

    return BinnedTriangles(pairs=pairs, starts=starts,
                           rpairs=rpairs, rstarts=rstarts,
                           gpairs=gpairs, gmeta=gmeta, overflow=overflow,
                           demand=nc_all.sum(dtype=jnp.int32),
                           tiles_x=tiles_x, tiles_y=tiles_y,
                           pair_cap=cap_all)


def pair_demand_of(setup: TriangleSetup,
                   k_max: int = K_MAX_DEFAULT) -> jnp.ndarray:
    """The pair count bin_triangles will emit for this setup (fine tier:
    covered tiles; row tier: covered tile rows) — the demand side of
    pair_cap_bucket. Keep the tiering rules in sync with bin_triangles."""
    span_w = setup.tile_hi[:, 0] - setup.tile_lo[:, 0] + 1
    span_h = setup.tile_hi[:, 1] - setup.tile_lo[:, 1] + 1
    ncover = span_w * span_h
    small = setup.valid & ~setup.big & (ncover <= k_max)
    medium = setup.valid & ~setup.big & (ncover > k_max)
    return jnp.where(small, ncover,
                     jnp.where(medium, span_h, 0)
                     ).astype(jnp.int32).sum()


def pair_cap_bucket(demand: int, t: int | None = None) -> int:
    """Demand-sized pair capacity for bin_triangles.

    The binning pipeline's cost is CAP-proportional (fill/cummax, two
    radix-rank passes, the [cap, R] record gather — measured 32.6 ms at
    cap 347k vs 19.5 at cap 111k on the bench scene, tools/
    profile_bin4.py), while the default cap is sized to the TRIANGLE
    BUFFER (T + T/4) — after frustum cull + LOD selection the live
    demand is typically a small fraction of T (bench scene: 42k of 347k,
    12%). This picks a static bucket >= 1.5x a measured demand from the
    {2^k, 1.5 * 2^k} ladder, the PSO-permutation analog of a driver
    sizing its bin buffers: log-spaced buckets bound recompiles, the
    64k floor keeps small scenes on one bucket, and `t` clamps at the
    safe default cap (the bucket never exceeds what bin_triangles would
    pick on its own). Demand rides BinnedTriangles.demand /
    out["saturation"]["raster_pairs"]; a frame whose demand outgrows
    the bucket sets overflow[0] > 0 and the caller regrows
    (VQRendererTPU.render), the GPU bin-overflow flush-and-resize
    analog."""
    need = max(65536, (3 * int(demand) + 1) // 2)
    bucket = GROUP
    while bucket < need:
        bucket *= 2
    # the half-step below a full doubling (1.5 * 2^k) halves the average
    # over-allocation — binning cost is cap-proportional
    if bucket // 2 * 3 // 2 >= need and bucket // 2 >= GROUP:
        bucket = bucket // 2 * 3 // 2
    if t is not None:
        bucket = min(bucket, default_pair_cap(t))
    return bucket


def default_pair_cap(t: int) -> int:
    """The safe T-sized cap bin_triangles picks with pair_capacity=None
    (see its comment for the sizing rationale)."""
    safe = (max(GROUP, min(int(t), 4 * 1024 * 1024))
            + max(8192, int(t) // 4))
    return cdiv(safe, GROUP) * GROUP


# ===========================================================================
# 4. the Pallas raster kernel
# ===========================================================================

NPX = TILE_H * TILE_W  # pixels per tile, laid out flat on the lane axis
TILES_PER_BLOCK = 8    # tiles processed per kernel instance (sublane rows)

# D3D standard 4x MSAA sample offsets from the pixel center, in pixels
# (the reference renders fixed 4x MSAA, RenderResources.h:25-26)
MSAA4_OFFSETS = ((-2 / 16, -6 / 16), (6 / 16, -2 / 16),
                 (-6 / 16, 2 / 16), (2 / 16, 6 / 16))


def _tile_p2b(lin):
    """bf16-exact local pixel rows [3, NPX]: (2*lx+1; 2*ly+1; 1). Local
    coords 2*lx+1 <= 255 are exactly representable in bf16's 8-bit
    mantissa — the p-side of the split eval dots carries no rounding."""
    lxf = (lin % TILE_W).astype(jnp.float32)
    lyf = (lin // TILE_W).astype(jnp.float32)
    return jnp.concatenate([2.0 * lxf + 1.0, 2.0 * lyf + 1.0,
                            jnp.ones_like(lxf)], axis=0).astype(jnp.bfloat16)


# bisect toggle: 1 = bf16 hi/lo split eval dots, 0 = exact 6-pass f32 dots
_SPLIT_EVAL = os.environ.get("VQE_SPLIT_EVAL", "1") == "1"


def _plane_eval_dots(cur, p2b, x0f, y0f, dn):
    """Evaluate the four plane rows of `cur` (e'0 e'1 e'2 dp) over the
    tile's pixels with TWO 1-pass bf16 MXU dots (hi+lo operand split,
    ~17-bit-mantissa accurate) instead of four 6-pass f32 dots — the
    6-pass eval dots measured ~8 ms of the 24 ms kernel at 284k tris.

    Tile-local reformulation keeps the p-side bf16-exact:
      b = (ex/2)(2lx+1) + (ey/2)(2ly+1) + ew2,
      ew2 = ew + ex*(x0+0.5-0.5?)  -- precisely: with px = x0 + lx + 0.5,
      b = ex*px + ey*py + ew = (ex/2)(2lx+1) + (ey/2)(2ly+1)
          + [ew + ex*x0 + ey*y0].
    The e-side splits into bf16 hi + bf16 lo residual (16-bit combined
    mantissa). A conservative +2^-15-relative bias on the edge planes
    (not depth) makes adjacent triangles' independently-rounded edges
    OVERLAP instead of cracking (depth test resolves double hits).
    Returns [4*GROUP, NPX]: plane p at rows p*GROUP:(p+1)*GROUP."""
    if not _SPLIT_EVAL:
        pf = p2b.astype(jnp.float32)
        px = pf[0:1] * 0.5 + x0f
        py = pf[1:2] * 0.5 + y0f
        p3 = jnp.concatenate([px, py, jnp.ones_like(px)], axis=0)
        return jnp.concatenate(
            [jax.lax.dot_general(cur[3 * p:3 * p + 3], p3, dn,
                                 preferred_element_type=jnp.float32)
             for p in range(4)], axis=0)
    parts_h, parts_l = [], []
    for p in range(4):
        er = cur[3 * p:3 * p + 3]
        ex2 = er[0:1] * 0.5
        ey2 = er[1:2] * 0.5
        ew2 = er[2:3] + er[0:1] * x0f + er[1:2] * y0f
        if p < 3:
            eps = (jnp.abs(ex2) * (2.0 * TILE_W) + jnp.abs(ey2)
                   * (2.0 * TILE_H) + jnp.abs(ew2)) * (2.0 ** -15)
            ew2 = ew2 + eps
        e2 = jnp.concatenate([ex2, ey2, ew2], axis=0)
        e2h = e2.astype(jnp.bfloat16)
        parts_h.append(e2h)
        parts_l.append((e2 - e2h.astype(jnp.float32)).astype(jnp.bfloat16))
    lh = jnp.concatenate(parts_h, axis=1)        # [3, 4*GROUP]
    ll = jnp.concatenate(parts_l, axis=1)
    one = jax.lax.Precision.DEFAULT
    return (jax.lax.dot_general(lh, p2b, dn, precision=one,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ll, p2b, dn, precision=one,
                                  preferred_element_type=jnp.float32))


def _make_raster_kernel(sample_offsets: tuple):
    """Build the raster kernel for N coverage samples per pixel.
    sample_offsets: ((dx, dy), ...) from the pixel center; a single (0,0)
    entry is the non-MSAA path. Outputs are per-sample depth/id buffers."""
    ns = len(sample_offsets)

    def kernel(starts_ref, rstarts_ref, gmeta_ref,  # scalar prefetch (SMEM)
               pairs_ref, rpairs_ref, gpairs_ref,   # HBM ("ANY") residents
               *refs):                         # ns depth outs, ns id outs, buf, sem
        depth_refs = refs[0:ns]
        id_refs = refs[ns:2 * ns]
        buf, sem = refs[2 * ns], refs[2 * ns + 1]

        blk = pl.program_id(0)
        tiles_x = gmeta_ref[1]
        sublane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, NPX), 0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
        dn = (((0,), (0,)), ((), ()))  # contract dim0 x dim0 -> [GROUP, NPX]

        def tile_body(t, _):
            tile = blk * TILES_PER_BLOCK + t
            ty = tile // tiles_x
            tx = tile % tiles_x

            # bf16-exact local pixel rows; the tile origin folds into the
            # per-record plane constants (see _plane_eval_dots)
            p2b = _tile_p2b(lin)
            x0f = (tx * TILE_W).astype(jnp.float32)
            y0f = (ty * TILE_H).astype(jnp.float32)

            def stream(src_ref, g0, g1, carry):
                """Depth-test group blocks [g0, g1). One group = GROUP
                triangles; edge/depth planes evaluate as [GROUP,3]x[3,NPX]
                MXU contractions once at the pixel center; per-sample
                coverage adds the per-record offset terms (e_x*dx + e_y*dy),
                a cheap [GROUP,1] broadcast. Records are self-validating.
                Group DMA is double-buffered to overlap with compute."""
                n_groups = g1 - g0

                @pl.when(n_groups > 0)
                def _():
                    pltpu.make_async_copy(src_ref.at[g0], buf.at[0],
                                          sem.at[0]).start()

                def group_body(i, carry):
                    g = g0 + i
                    slot = jax.lax.rem(i, 2)
                    nxt = jax.lax.rem(i + 1, 2)

                    @pl.when(g + 1 < g1)
                    def _():
                        pltpu.make_async_copy(src_ref.at[g + 1], buf.at[nxt],
                                              sem.at[nxt]).start()

                    pltpu.make_async_copy(src_ref.at[g], buf.at[slot],
                                          sem.at[slot]).wait()
                    cur = buf.at[slot]

                    # (Precision.HIGH is not lowerable by Mosaic; all
                    # kernel dots run the exact 6-pass config default)
                    bz = _plane_eval_dots(cur, p2b, x0f, y0f, dn)
                    b0 = bz[0:GROUP]
                    b1 = bz[GROUP:2 * GROUP]
                    b2 = bz[2 * GROUP:3 * GROUP]
                    z = bz[3 * GROUP:4 * GROUP]
                    ids = cur[12:13]

                    new = []
                    for s, (dx, dy) in enumerate(sample_offsets):
                        depth, idbuf = carry[s]
                        if dx == 0.0 and dy == 0.0:
                            b0s, b1s, b2s, zs = b0, b1, b2, z
                        else:
                            o0 = cur[0:1] * dx + cur[1:2] * dy   # [1, GROUP]
                            o1 = cur[3:4] * dx + cur[4:5] * dy
                            o2 = cur[6:7] * dx + cur[7:8] * dy
                            oz = cur[9:10] * dx + cur[10:11] * dy
                            # broadcast [1,GROUP] offsets onto [GROUP,NPX]
                            b0s = b0 + jnp.broadcast_to(o0.T, (GROUP, NPX))
                            b1s = b1 + jnp.broadcast_to(o1.T, (GROUP, NPX))
                            b2s = b2 + jnp.broadcast_to(o2.T, (GROUP, NPX))
                            zs = z + jnp.broadcast_to(oz.T, (GROUP, NPX))
                        cover = (b0s >= 0.0) & (b1s >= 0.0) & (b2s >= 0.0) & (zs >= 0.0)
                        zm = jnp.where(cover, zs, 2.0)
                        zmin = jnp.min(zm, axis=0, keepdims=True)
                        amin = jnp.argmin(zm, axis=0).astype(jnp.int32)[None, :]
                        onehot = (sublane == amin).astype(jnp.float32)
                        idsel = jnp.dot(ids, onehot, preferred_element_type=jnp.float32)
                        upd = zmin < depth
                        new.append((jnp.where(upd, zmin, depth),
                                    jnp.where(upd, idsel, idbuf)))
                    return tuple(new)

                return jax.lax.fori_loop(0, n_groups, group_body, carry)

            init = tuple((jnp.full((1, NPX), 1.0, dtype=jnp.float32),
                          jnp.full((1, NPX), jnp.float32(BG_ID)))
                         for _ in range(ns))
            carry = stream(gpairs_ref, jnp.int32(0),
                           pl.cdiv(gmeta_ref[0], GROUP), init)
            carry = stream(rpairs_ref, rstarts_ref[ty] // GROUP,
                           pl.cdiv(rstarts_ref[ty + 1], GROUP), carry)
            start = starts_ref[tile]
            end = starts_ref[tile + 1]
            carry = stream(pairs_ref, start // GROUP, pl.cdiv(end, GROUP), carry)

            for s in range(ns):
                depth, idbuf = carry[s]
                depth_refs[s][pl.ds(t, 1), :] = depth
                id_refs[s][pl.ds(t, 1), :] = idbuf.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, TILES_PER_BLOCK, tile_body, 0)

    return kernel


_raster_kernel_center = _make_raster_kernel(((0.0, 0.0),))
_raster_kernel_msaa4 = _make_raster_kernel(MSAA4_OFFSETS)


# ===========================================================================
# G-buffer raster kernel: interpolates shading attributes in-kernel.
#
# Per-pixel gathers on TPU cost ~1 element/cycle (a [2M]x[T,48] row gather
# measured 137 ms), so the visibility-buffer + resolve-gather design pays
# hundreds of ms. Instead, records carry the per-vertex shading attributes
# and the kernel selects + interpolates the winner's attributes with ONE
# extra [R_sel, GROUP] x [GROUP, NPX] MXU dot per group — the only per-pixel
# "gather" left is the systolic array doing one-hot selection.
#
# Record layout (GBUF_ROWS = 32). Binning cost scales with record width
# (the per-pair record gather moves width * capacity elements), so the
# per-vertex normal+tangent pairs ride as bf16 packed into single f32
# words, (material, item) ids fuse into one integer-exact f32, and the
# vertex conditioning scales are folded into the edge rows (_pack_records):
#   0-8   e' rows (scale-folded)   9-11  dp        12  tri id
#   13-17 v0 attrs: pack(nrm.x,tan.x) pack(nrm.y,tan.y) pack(nrm.z,tan.z) u v
#   18-22 v1 attrs      23-27 v2 attrs
#   28    mid*65536+item (exact < 2^24)  29  object id  30-31 pad
# The normal is biased +3.0 before bf16 rounding so the packed word's
# exponent is always normal (a zero normal component would otherwise make
# the f32 denormal and the MXU selection dot would flush the tangent bits).
#
# The per-group loop carries (depth, selected record rows [SEL_ROWS, NPX]);
# barycentric weights + attribute interpolation happen ONCE per tile after
# the loop (recomputing b'_i from the winner's e' rows), not per group —
# that removes the 3 per-group [GROUP, NPX] weight reductions that used to
# be ~half the kernel's VPU work.
# ===========================================================================

GBUF_ROWS = 32
SEL_ROWS = 30        # rows 0..29 ride through the per-group selection dot
# experiment knobs (tools/profile_geom_sel.py): shrink the selection dot /
# drop the 6-pass f32 precision to attribute kernel time. NOT for
# production — both corrupt G-buffer attributes.
_X_SEL_ROWS = None
_X_SEL_PRECISION = None
_X_EVAL_PRECISION = None
GBUF_VATTR = 5       # per-vertex attr rows: packed nrm/tan(3) uv(2)
NRM_PACK_BIAS = 3.0
# kernel gbuf output channels: nrm(3) tan(3) uv(2) mid obj item = 11 -> pad 16
GBUF_OUT = 16


def _pack_bf16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Two f32 arrays -> one f32 whose top/bottom 16 bits are their bf16
    roundings (hi supplies the exponent; keep it away from 0 and 255)."""
    hb = jax.lax.bitcast_convert_type(
        hi.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    lb = jax.lax.bitcast_convert_type(
        lo.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((hb << 16) | lb, jnp.float32)


def pack_gbuf_extra(normals_w: jnp.ndarray, tangents_w: jnp.ndarray,
                    uvs: jnp.ndarray, indices: jnp.ndarray,
                    tri_mid: jnp.ndarray, tri_obj: jnp.ndarray,
                    tri_item: jnp.ndarray) -> jnp.ndarray:
    """Build the extra record columns for the G-buffer kernel:
    [T, 3*GBUF_VATTR + 2]."""
    t = indices.shape[0]
    packed_nt = _pack_bf16_pair(normals_w + NRM_PACK_BIAS, tangents_w)
    va = jnp.concatenate([packed_nt, uvs], axis=1)               # [V, 5]
    pv = va[indices]                                             # [T, 3, 5]
    mid_item = (tri_mid.astype(jnp.float32) * 65536.0
                + tri_item.astype(jnp.float32))
    return jnp.concatenate(
        [pv.reshape(t, 3 * GBUF_VATTR),
         mid_item[:, None],
         tri_obj.astype(jnp.float32)[:, None]], axis=1)


def pack_gbuf_extra_corners(corner_normals: jnp.ndarray,
                            corner_tangents: jnp.ndarray,
                            corner_uvs: jnp.ndarray,
                            tri_item: jnp.ndarray,
                            normal_mats: jnp.ndarray,
                            tri_mid: jnp.ndarray,
                            tri_obj: jnp.ndarray) -> jnp.ndarray:
    """Gather-free variant of pack_gbuf_extra: per-corner object-space
    normals/tangents/uvs come from static [3T, .] tables (built once at
    upload from the static index buffer), and the per-corner normal-matrix
    fetch is a palette-kernel MXU matmul."""
    from .palette import palette_lookup
    t = tri_item.shape[0]
    n = normal_mats.shape[0]
    item3 = jnp.repeat(tri_item, 3, total_repeat_length=3 * t)
    nm = palette_lookup(item3, normal_mats.reshape(n, 9)).reshape(-1, 3, 3)
    wnrm = jnp.einsum("cij,cj->ci", nm, corner_normals)
    wtan = jnp.einsum("cij,cj->ci", nm, corner_tangents)
    packed_nt = _pack_bf16_pair(wnrm + NRM_PACK_BIAS, wtan)      # [3T, 3]
    va = jnp.concatenate([packed_nt, corner_uvs], axis=1)       # [3T, 5]
    mid_item = (tri_mid.astype(jnp.float32) * 65536.0
                + tri_item.astype(jnp.float32))
    return jnp.concatenate(
        [va.reshape(t, 3 * GBUF_VATTR),
         mid_item[:, None],
         tri_obj.astype(jnp.float32)[:, None]], axis=1)


def _make_gbuf_kernel(sample_offsets: tuple | None = None,
                      bounded: bool = False):
    """G-buffer raster kernel. sample_offsets=None tests coverage at the
    pixel center (single sample). With offsets (MSAA), each triangle is
    covered if ANY sample passes its edge tests; the depth/attribute winner
    is the min-depth covered triangle (the reference's min-depth MSAA
    resolve, DepthResolve.hlsl), attributes interpolate at the pixel center
    with clamped barycentrics (centroid-style), and a per-sample coverage
    carry yields the [0,1] coverage output for silhouette blending —
    per-sample color buffers never exist, matching ResolveMSAA's
    shade-once-blend-by-coverage economics without the bandwidth.

    bounded adds a per-pixel depth window input [2, NPX] (zlo, zhi): only
    fragments with zlo < z < zhi compete. This is the depth-peeling
    primitive behind alpha-mask discard (ForwardLighting.hlsl:237-240 —
    peel past a failed cutout fragment) and the 2-layer transparent pass
    (zhi = opaque depth)."""
    ns = 0 if sample_offsets is None else len(sample_offsets)

    def kernel(starts_ref, rstarts_ref, gmeta_ref,  # scalar prefetch (SMEM)
               pairs_ref, rpairs_ref, gpairs_ref,   # HBM residents
               *refs):                           # [zbound], outs..., buf, sem
        if bounded:
            zbound_ref, refs = refs[0], refs[1:]
        if ns:
            depth_ref, id_ref, gbuf_ref, cov_ref = refs[0:4]
            buf, sem = refs[4], refs[5]
        else:
            depth_ref, id_ref, gbuf_ref = refs[0:3]
            buf, sem = refs[3], refs[4]
        blk = pl.program_id(0)
        tiles_x = gmeta_ref[1]
        sublane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, NPX), 0)
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, NPX), 1)
        dn = (((0,), (0,)), ((), ()))

        def tile_body(t, _):
            tile = blk * TILES_PER_BLOCK + t
            ty = tile // tiles_x
            tx = tile % tiles_x
            px = (lin % TILE_W).astype(jnp.float32) + (tx * TILE_W).astype(jnp.float32) + 0.5
            py = (lin // TILE_W).astype(jnp.float32) + (ty * TILE_H).astype(jnp.float32) + 0.5
            p2b = _tile_p2b(lin)
            x0f = (tx * TILE_W).astype(jnp.float32)
            y0f = (ty * TILE_H).astype(jnp.float32)
            if bounded:
                zb = zbound_ref[pl.ds(t, 1)][0]              # [2, NPX]
                zlo, zhi = zb[0:1], zb[1:2]                  # [1, NPX] each

            def stream(src_ref, g0, g1, carry):
                n_groups = g1 - g0

                @pl.when(n_groups > 0)
                def _():
                    pltpu.make_async_copy(src_ref.at[g0], buf.at[0],
                                          sem.at[0]).start()

                def group_body(i, carry):
                    if ns:
                        depth, idbuf, selbuf, covc = carry
                    else:
                        depth, idbuf, selbuf = carry
                    g = g0 + i
                    slot = jax.lax.rem(i, 2)
                    nxt = jax.lax.rem(i + 1, 2)

                    @pl.when(g + 1 < g1)
                    def _():
                        pltpu.make_async_copy(src_ref.at[g + 1], buf.at[nxt],
                                              sem.at[nxt]).start()
                    pltpu.make_async_copy(src_ref.at[g], buf.at[slot],
                                          sem.at[slot]).wait()
                    cur = buf.at[slot]

                    # (Precision.HIGH is not lowerable by Mosaic; all
                    # kernel dots run the exact 6-pass config default)
                    bz = _plane_eval_dots(cur, p2b, x0f, y0f, dn)
                    b0 = bz[0:GROUP]
                    b1 = bz[GROUP:2 * GROUP]
                    b2 = bz[2 * GROUP:3 * GROUP]
                    z = bz[3 * GROUP:4 * GROUP]
                    if ns:
                        # per-sample edge tests against per-triangle offset
                        # thresholds (b_i(sample) = b_i(center) + e_ix*dx +
                        # e_iy*dy, so covered iff b_i >= -offset — a [G,1]
                        # broadcast compare, no per-sample [G,NPX] adds;
                        # z varies sub-pixel so the center value keys the
                        # depth test)
                        zok = (z >= 0.0) & (z <= 1.0)
                        if bounded:
                            zok = zok & (z > zlo) & (z < zhi)
                        covers = []
                        for dx, dy in sample_offsets:
                            t0 = -(cur[0:1] * dx + cur[1:2] * dy).T   # [G,1]
                            t1 = -(cur[3:4] * dx + cur[4:5] * dy).T
                            t2 = -(cur[6:7] * dx + cur[7:8] * dy).T
                            covers.append((b0 >= t0) & (b1 >= t1)
                                          & (b2 >= t2) & zok)
                        cover_any = covers[0]
                        for c in covers[1:]:
                            cover_any = cover_any | c
                        # per-sample "any triangle in this group covers the
                        # sample" -> sticky coverage carry [ns, NPX]
                        anyc = jnp.concatenate(
                            [jnp.max(c.astype(jnp.float32), axis=0,
                                     keepdims=True) for c in covers], axis=0)
                        covc = jnp.maximum(covc, anyc)
                        # depth key: center-covered triangles (key = z) beat
                        # sample-only ones (key = z + 1) so interior edges
                        # resolve like the center-sampled path — only true
                        # silhouette pixels (center outside every triangle)
                        # fall back to the nearest sample-covered winner.
                        # Killed/uncovered = 4 (the msaa carry inits at 4).
                        cover_c = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & zok
                        zm = jnp.where(cover_c, z,
                                       jnp.where(cover_any, z + 1.0, 4.0))
                    else:
                        cover = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0) & (z >= 0.0)
                        if bounded:
                            cover = cover & (z > zlo) & (z < zhi)
                        zm = jnp.where(cover, z, 2.0)
                    zmin = jnp.min(zm, axis=0, keepdims=True)
                    amin = jnp.argmin(zm, axis=0).astype(jnp.int32)[None, :]
                    onehot = (sublane == amin).astype(jnp.float32)

                    # ONE MXU dot selects the winner's full record (edge
                    # rows + attributes); barycentrics + interpolation
                    # happen once per tile after the group loop.
                    sel_rows = _X_SEL_ROWS or SEL_ROWS
                    sel = jnp.dot(cur[0:sel_rows], onehot,
                                  precision=_X_SEL_PRECISION,
                                  preferred_element_type=jnp.float32)
                    if sel_rows < SEL_ROWS:
                        sel = jnp.concatenate(
                            [sel, jnp.zeros((SEL_ROWS - sel_rows, NPX),
                                            jnp.float32)], axis=0)

                    upd = zmin < depth
                    new_carry = (jnp.where(upd, zmin, depth),
                                 jnp.where(upd, sel[12:13], idbuf),
                                 jnp.where(upd, sel, selbuf))
                    if ns:
                        new_carry = new_carry + (covc,)
                    return new_carry

                return jax.lax.fori_loop(0, n_groups, group_body, carry)

            # msaa inits the depth-key carry at 4 (above both the [0,1]
            # center-key band and the [1,2] sample-only band)
            depth0 = jnp.full((1, NPX), 4.0 if ns else 1.0, dtype=jnp.float32)
            id0 = jnp.full((1, NPX), jnp.float32(BG_ID))
            sel0 = jnp.zeros((SEL_ROWS, NPX), jnp.float32)
            init = (depth0, id0, sel0)
            if ns:
                init = init + (jnp.zeros((ns, NPX), jnp.float32),)

            carry = stream(gpairs_ref, jnp.int32(0),
                           pl.cdiv(gmeta_ref[0], GROUP), init)
            carry = stream(rpairs_ref, rstarts_ref[ty] // GROUP,
                           pl.cdiv(rstarts_ref[ty + 1], GROUP), carry)
            start = starts_ref[tile]
            end = starts_ref[tile + 1]
            carry = stream(pairs_ref, start // GROUP,
                           pl.cdiv(end, GROUP), carry)
            depth, idbuf, sel = carry[0:3]
            if ns:
                # un-bias the depth key: [0,1) center-covered stays, [1,2)
                # sample-only drops the +1, 4 (empty) -> background 1.0
                depth = jnp.where(depth < 1.0, depth,
                                  jnp.where(depth < 3.0, depth - 1.0, 1.0))

            # per-tile resolve: winner's perspective barycentrics from the
            # scale-folded edge rows (b'_i = e'_i . p is the unnormalized
            # weight; background pixels have sel = 0 -> weights 0)
            l0 = jnp.maximum(sel[0:1] * px + sel[1:2] * py + sel[2:3], 0.0)
            l1 = jnp.maximum(sel[3:4] * px + sel[4:5] * py + sel[5:6], 0.0)
            l2 = jnp.maximum(sel[6:7] * px + sel[7:8] * py + sel[8:9], 0.0)
            lsum = jnp.maximum(l0 + l1 + l2, 1e-30)
            l0, l1, l2 = l0 / lsum, l1 / lsum, l2 / lsum

            def unpack(rows):            # [5, NPX] -> [8, NPX]
                pw = jax.lax.bitcast_convert_type(rows[0:3], jnp.uint32)
                nrm = jax.lax.bitcast_convert_type(
                    pw & jnp.uint32(0xFFFF0000), jnp.float32) - NRM_PACK_BIAS
                tan = jax.lax.bitcast_convert_type(pw << 16, jnp.float32)
                return jnp.concatenate([nrm, tan, rows[3:5]], axis=0)

            a0 = unpack(sel[13:18])
            a1 = unpack(sel[18:23])
            a2 = unpack(sel[23:28])
            mi = sel[28:29].astype(jnp.int32)
            misc = jnp.concatenate([
                (mi >> 16).astype(jnp.float32),
                sel[29:30],
                (mi & 0xFFFF).astype(jnp.float32)], axis=0)
            interp = a0 * l0 + a1 * l1 + a2 * l2         # [8, NPX]
            gvals = jnp.concatenate(
                [interp, misc,
                 jnp.zeros((GBUF_OUT - 11, NPX), jnp.float32)], axis=0)

            depth_ref[pl.ds(t, 1), :] = depth
            # background pixels: sel stayed 0 (unpack would yield the -3
            # normal bias) — zero the G-buffer wherever the id carry still
            # holds BG.
            is_bg = idbuf < 0.0
            id_ref[pl.ds(t, 1), :] = idbuf.astype(jnp.int32)
            gbuf_ref[t, :, :] = jnp.where(is_bg, 0.0, gvals)
            if ns:
                # per-sample sticky any-triangle coverage [ns, NPX]: the
                # mean is the silhouette blend weight; the per-sample bits
                # feed the edge resolve's exact background counting
                cov_ref[t, :, :] = carry[3]
            return 0

        jax.lax.fori_loop(0, TILES_PER_BLOCK, tile_body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _get_gbuf_kernel(msaa: bool, bounded: bool):
    return _make_gbuf_kernel(MSAA4_OFFSETS if msaa else None, bounded=bounded)


def tile_image(img: jnp.ndarray, tiles_x: int, tiles_y: int) -> jnp.ndarray:
    """[H, W] image -> [NT, NPX] tile-major layout (inverse of the raster
    untile), edge-padded to whole tiles."""
    h, w = img.shape
    ph, pw = tiles_y * TILE_H - h, tiles_x * TILE_W - w
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), mode="edge")
    img = img.reshape(tiles_y, TILE_H, tiles_x, TILE_W)
    return img.transpose(0, 2, 1, 3).reshape(tiles_y * tiles_x, NPX)


def rasterize_gbuf(binned: BinnedTriangles, width: int, height: int,
                   msaa: bool = False,
                   zbound: tuple[jnp.ndarray, jnp.ndarray] | None = None):
    """G-buffer rasterization: -> (depth [H,W], tri_id [H,W],
    gbuf [GBUF_OUT, H, W]) with channels
    0-2 world normal | 3-5 world tangent | 6-7 uv | 8 material id |
    9 object id | 10 item id. Records must be packed with pack_gbuf_extra.
    With msaa, a 4th return: per-sample coverage [4,H,W] in {0,1} (D3D 4x
    pattern; mean over axis 0 is the silhouette blend weight), and
    depth/id/attributes resolve to the min-depth covered triangle across
    samples (DepthResolve.hlsl semantics).
    zbound = (zlo [H,W], zhi [H,W]): only fragments in the open window
    (zlo, zhi) compete — the depth-peeling primitive for alpha-mask
    discard and the transparent pass.
    """
    tiles_x, tiles_y = binned.tiles_x, binned.tiles_y
    nt = tiles_x * tiles_y
    nblk = cdiv(nt, TILES_PER_BLOCK)
    nt_pad = nblk * TILES_PER_BLOCK

    starts = binned.starts
    if nt_pad > nt:
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[-1], (nt_pad - nt,))])
    # padded tiles can fall on a row index past tiles_y: extend rstarts
    # with empty trailing segments
    rstarts = binned.rstarts
    ty_pad = (nt_pad - 1) // tiles_x + 2 - (tiles_y + 1)
    if ty_pad > 0:
        rstarts = jnp.concatenate(
            [rstarts, jnp.broadcast_to(rstarts[-1], (ty_pad,))])

    out_spec2d = pl.BlockSpec((TILES_PER_BLOCK, NPX), lambda blk, *_: (blk, 0),
                              memory_space=pltpu.VMEM)
    out_spec3d = pl.BlockSpec((TILES_PER_BLOCK, GBUF_OUT, NPX),
                              lambda blk, *_: (blk, 0, 0),
                              memory_space=pltpu.VMEM)
    out_specs = [out_spec2d, out_spec2d, out_spec3d]
    out_shape = [
        jax.ShapeDtypeStruct((nt_pad, NPX), jnp.float32),
        jax.ShapeDtypeStruct((nt_pad, NPX), jnp.int32),
        jax.ShapeDtypeStruct((nt_pad, GBUF_OUT, NPX), jnp.float32),
    ]
    if msaa:
        ns = len(MSAA4_OFFSETS)
        out_specs.append(pl.BlockSpec((TILES_PER_BLOCK, ns, NPX),
                                      lambda blk, *_: (blk, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nt_pad, ns, NPX), jnp.float32))
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    inputs = [starts, rstarts, binned.gmeta,
              binned.pairs, binned.rpairs, binned.gpairs]
    if zbound is not None:
        zb = jnp.stack([tile_image(zbound[0], tiles_x, tiles_y),
                        tile_image(zbound[1], tiles_x, tiles_y)], axis=1)
        if nt_pad > nt:
            zb = jnp.concatenate(
                [zb, jnp.broadcast_to(zb[-1:], (nt_pad - nt, 2, NPX))])
        in_specs.append(pl.BlockSpec((TILES_PER_BLOCK, 2, NPX),
                                     lambda blk, *_: (blk, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(zb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, GBUF_ROWS, GROUP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pallas_call(
        _get_gbuf_kernel(msaa, zbound is not None),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    depth, tri_id, gbuf = outs[0:3]

    def untile(a):
        img = a[:nt].reshape(tiles_y, tiles_x, TILE_H, TILE_W)
        img = img.transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W)
        return img[:height, :width]

    g = gbuf[:nt].reshape(tiles_y, tiles_x, GBUF_OUT, TILE_H, TILE_W)
    g = g.transpose(2, 0, 3, 1, 4).reshape(GBUF_OUT, tiles_y * TILE_H,
                                           tiles_x * TILE_W)
    if msaa:
        ns = len(MSAA4_OFFSETS)
        c = outs[3][:nt].reshape(tiles_y, tiles_x, ns, TILE_H, TILE_W)
        c = c.transpose(2, 0, 3, 1, 4).reshape(ns, tiles_y * TILE_H,
                                               tiles_x * TILE_W)
        return (untile(depth), untile(tri_id), g[:, :height, :width],
                c[:, :height, :width])
    return untile(depth), untile(tri_id), g[:, :height, :width]


def rasterize(binned: BinnedTriangles, width: int, height: int,
              msaa: bool = False):
    """-> (depth [H, W] f32 in [0,1], tri_id [H, W] int32) for the center
    sample, or with msaa: per-sample stacks ([4, H, W] each, D3D standard
    4x pattern).

    H/W are padded up to tile multiples internally and cropped on return.
    """
    tiles_x, tiles_y = binned.tiles_x, binned.tiles_y
    nt = tiles_x * tiles_y
    nblk = cdiv(nt, TILES_PER_BLOCK)
    nt_pad = nblk * TILES_PER_BLOCK
    ns = 4 if msaa else 1
    kernel = _raster_kernel_msaa4 if msaa else _raster_kernel_center

    # pad starts with empty trailing segments for the padded tiles
    starts = binned.starts
    if nt_pad > nt:
        starts = jnp.concatenate(
            [starts, jnp.broadcast_to(starts[-1], (nt_pad - nt,))])
    rstarts = binned.rstarts
    ty_pad = (nt_pad - 1) // tiles_x + 2 - (tiles_y + 1)
    if ty_pad > 0:
        rstarts = jnp.concatenate(
            [rstarts, jnp.broadcast_to(rstarts[-1], (ty_pad,))])

    out_spec = pl.BlockSpec((TILES_PER_BLOCK, NPX), lambda blk, *_: (blk, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[out_spec] * (2 * ns),
        scratch_shapes=[
            pltpu.VMEM((2, PAIR_ROWS, GROUP), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((nt_pad, NPX), jnp.float32)] * ns
            + [jax.ShapeDtypeStruct((nt_pad, NPX), jnp.int32)] * ns
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # small framebuffers let XLA place whole outputs in VMEM; the
            # 4x MSAA variant (8 outputs) then blows the default 16 MB
            # scoped-vmem budget (seen at 640x360 with AA on)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(starts, rstarts, binned.gmeta, binned.pairs, binned.rpairs,
      binned.gpairs)

    # untangle [NT, NPX] tile-major layout into the [H, W] image
    def untile(a):
        img = a[:nt].reshape(tiles_y, tiles_x, TILE_H, TILE_W)
        img = img.transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W)
        return img[:height, :width]

    if not msaa:
        return untile(outs[0]), untile(outs[1])
    depth = jnp.stack([untile(outs[s]) for s in range(4)])
    tri_id = jnp.stack([untile(outs[4 + s]) for s in range(4)])
    return depth, tri_id


def msaa_resolve_visibility(depth_s: jnp.ndarray, tri_id_s: jnp.ndarray):
    """Per-sample visibility [4,H,W] -> (center-ish depth [H,W], majority
    tri_id [H,W], coverage [H,W] in {0,.25,..,1}).

    Shading then runs once per pixel on the majority triangle and blends
    with the background by coverage — the silhouette antialiasing the
    reference's MSAA 4x + resolve provides (ResolveMSAA,
    SceneRendering.cpp:2060)."""
    # majority id: the id matching most samples (ties -> first sample)
    ids = tri_id_s                                 # [4, H, W]
    counts = [(ids == ids[s]).sum(axis=0) for s in range(4)]
    counts = jnp.stack(counts)                     # [4, H, W]
    # prefer covered samples: background samples count as -1 votes
    counts = jnp.where(ids >= 0, counts, -1)
    best = jnp.argmax(counts, axis=0)              # [H, W]
    maj = jnp.take_along_axis(ids, best[None], axis=0)[0]
    depth = jnp.take_along_axis(depth_s, best[None], axis=0)[0]
    coverage = (ids >= 0).mean(axis=0, dtype=jnp.float32)
    return depth, maj, coverage


# ===========================================================================
# 5. attribute resolve (visibility buffer -> interpolated G-buffer)
# ===========================================================================

def resolve_attributes(tri_id: jnp.ndarray, setup: TriangleSetup,
                       indices: jnp.ndarray,
                       attributes: dict[str, jnp.ndarray],
                       y_offset: jnp.ndarray | int = 0,
                       tri_features: dict[str, jnp.ndarray] | None = None):
    """tri_id [H,W] int32, setup from setup_triangles, indices [T,3],
    attributes name -> [V, D] (interpolated), tri_features name -> [T, D]
    (per-triangle, selected not blended — e.g. the material row).
    Returns (dict name -> [H,W,D], mask [H,W]).

    Gather strategy: all per-triangle resolve data (edge rows, vertex
    conditioning scales, the three vertices' attribute values, AND any
    per-triangle features) packs into ONE [T, R] table built with cheap
    per-triangle gathers, so the expensive per-pixel step is a single row
    gather — TPU gathers are latency-bound, not bandwidth-bound."""
    h, w = tri_id.shape
    mask = tri_id != BG_ID
    sid = jnp.maximum(tri_id, 0)
    t = setup.edges9.shape[0]

    # pack the per-triangle table: edges(9) | vert_scale(3) | attrs (3V x D)
    parts = [setup.edges9, setup.vert_scale]
    layout = []
    off = 12
    for name, a in attributes.items():
        d = a.shape[-1]
        av = a[indices]                              # [T, 3, D] (per-tri gather)
        parts.append(av.reshape(t, 3 * d))
        layout.append((name, off, d))
        off += 3 * d
    feat_layout = []
    for name, f in (tri_features or {}).items():
        d = f.shape[-1]
        parts.append(f.astype(jnp.float32))
        feat_layout.append((name, off, d))
        off += d
    table = jnp.concatenate(parts, axis=1)          # [T, R]

    rows = table[sid]                                # [H, W, R] — THE gather

    px = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
    py = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
          + jnp.asarray(y_offset, jnp.float32))
    e = rows[..., 0:9].reshape(*rows.shape[:-1], 3, 3)
    b = e[..., 0] * px[..., None] + e[..., 1] * py[..., None] + e[..., 2]
    b = jnp.maximum(b, 0.0)                          # guard tiny negatives on edges
    # undo the per-vertex 1/|w| conditioning: true weight_i = b'_i * s_i
    b = b * rows[..., 9:12]
    bsum = b.sum(axis=-1)
    binv = 1.0 / jnp.where(bsum > 0, bsum, 1.0)
    lam = b * binv[..., None]                        # [H,W,3] perspective barycentrics

    out = {}
    for name, off0, d in layout:
        av = rows[..., off0:off0 + 3 * d].reshape(*rows.shape[:-1], 3, d)
        out[name] = (lam[..., None] * av).sum(axis=-2)
    for name, off0, d in feat_layout:
        out[name] = rows[..., off0:off0 + d]
    return out, mask


# ===========================================================================
# record evaluation outside the kernel (sparse / edge-resolve paths)
# ===========================================================================

def eval_record_planes(rec: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Evaluate a packed record's edge + depth planes at pixel coords.

    rec [..., >=13] rows in _pack_records layout (scaled edges 0-8, depth
    plane 9-11, id 12); px/py broadcastable pixel-center/sample coords.
    Returns (b0, b1, b2, z): coverage iff all b_i >= 0 and 0 <= z <= 1 —
    exactly the kernel's test, so post-kernel per-sample re-evaluation
    agrees with in-kernel visibility."""
    b0 = rec[..., 0] * px + rec[..., 1] * py + rec[..., 2]
    b1 = rec[..., 3] * px + rec[..., 4] * py + rec[..., 5]
    b2 = rec[..., 6] * px + rec[..., 7] * py + rec[..., 8]
    z = rec[..., 9] * px + rec[..., 10] * py + rec[..., 11]
    return b0, b1, b2, z


def interp_record_attrs(rec: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """jnp replica of the G-buffer kernel's per-pixel resolve for compacted
    pixel sets (the sparse edge-resolve path shades a few-% pixel list, so
    this runs as plain vectorized ops instead of inside the kernel).

    rec [N, R] gbuf-mode records (pack_gbuf_extra columns), px/py [N]
    pixel-center coords -> dict(depth [N], wnrm/wtan [N,3], uv [N,2],
    mat_id/object_id/item_id [N] int32). Matches _make_gbuf_kernel's
    barycentric clamp + bf16-pair unpack bit-for-bit."""
    b0, b1, b2, z = eval_record_planes(rec, px, py)
    l0 = jnp.maximum(b0, 0.0)
    l1 = jnp.maximum(b1, 0.0)
    l2 = jnp.maximum(b2, 0.0)
    lsum = jnp.maximum(l0 + l1 + l2, 1e-30)
    l0, l1, l2 = l0 / lsum, l1 / lsum, l2 / lsum

    def unpack(rows):                       # [N, 5] -> nrm [N,3], tan, uv
        pw = jax.lax.bitcast_convert_type(rows[:, 0:3], jnp.uint32)
        nrm = jax.lax.bitcast_convert_type(
            pw & jnp.uint32(0xFFFF0000), jnp.float32) - NRM_PACK_BIAS
        tan = jax.lax.bitcast_convert_type(pw << 16, jnp.float32)
        return nrm, tan, rows[:, 3:5]

    n0, t0, u0 = unpack(rec[:, 13:18])
    n1, t1, u1 = unpack(rec[:, 18:23])
    n2, t2, u2 = unpack(rec[:, 23:28])
    w0, w1, w2 = l0[:, None], l1[:, None], l2[:, None]
    mi = rec[:, 28].astype(jnp.int32)
    return {
        "depth": jnp.clip(z, 0.0, 1.0),
        "wnrm": n0 * w0 + n1 * w1 + n2 * w2,
        "wtan": t0 * w0 + t1 * w1 + t2 * w2,
        "uv": u0 * w0 + u1 * w1 + u2 * w2,
        "mat_id": mi >> 16,
        "object_id": rec[:, 29].astype(jnp.int32),
        "item_id": mi & 0xFFFF,
    }


def pack_records(setup: TriangleSetup,
                 extra: jnp.ndarray | None = None) -> jnp.ndarray:
    """Public per-triangle record table [T, R] (the same packing
    bin_triangles performs internally — under jit XLA CSEs the duplicate,
    so callers that also bin pay nothing extra)."""
    return _pack_records(setup, extra)


# ===========================================================================
# convenience: one-call depth+id render
# ===========================================================================

@functools.partial(jax.jit, static_argnames=("width", "height", "k_max"))
def render_visibility(clip: jnp.ndarray, indices: jnp.ndarray,
                      width: int, height: int, k_max: int = K_MAX_DEFAULT):
    """clip [V,4], indices [T,3] -> (depth [H,W], tri_id [H,W])."""
    setup = setup_triangles(clip, indices, width, height)
    binned = bin_triangles(setup, width, height, k_max)
    depth, tri_id = rasterize(binned, width, height)
    return depth, tri_id, setup
