"""Texture sampling — the shading-time counterpart of the reference's
sampler states + Texture2D.Sample calls (ForwardLighting.hlsl:81-102:
linear/point/aniso samplers over 9 material texture slots).

Two storage layouts:

1. Array-of-textures mip tensors ([N, S, S, 4] f32 per level) — the exact
   path (tests, HDR textures).
2. **Quad-packed RGBA8** (`PackedTextures`): each gather row holds a full
   2x2 bilinear footprint as four RGBA8 texels packed into int32 lanes,
   stored in 4 phase-shifted copies (one per (y0&1, x0&1) parity) so ANY
   footprint lands in exactly one row. A bilinear tap = ONE 4-element row
   gather + VPU unpack, vs 8 gathers x 4 f32 elements for trilinear on
   layout 1 — TPU gathers run at ~1 element/cycle, so this is the
   difference between ~3 ms and ~25 ms per textured slot at 1080p.
   Memory = 16 B/texel (4 copies x RGBA8), the same as one f32 RGBA copy.

Every pixel carries a per-slot texture id so one vectorized pass samples
the whole screen.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

# Adaptive-aniso-walk activation ladder, scored on the UNCLAMPED
# anisotropy ratio. The clamp (uv_mip_level_aniso) piles every grazing
# pixel at exactly max_aniso, so a clamped-score ladder cannot subdivide
# that tier: when the tier alone exceeds the walk capacity the only
# satisfiable rung is all-False and the walk silently sheds EVERYTHING
# (observed in the r5 BENCH 171.9 run — tex_aniso 0.0 at 17.5x-cap
# demand). Rungs above the clamp rank within the tier by TRUE anisotropy,
# so any capacity buys the genuinely worst pixels; inf is the
# always-satisfiable "walk nothing" top rung (only reached when even the
# 256x-anisotropy set overflows). Pixels below the chosen rung keep the
# aniso-clamped single tap: over-blurred, never aliased.
ANISO_THRS = (1.3, 1.6, 2.0, 2.6, 3.4, 4.4, 5.6, 7.0,
              10.0, 14.0, 20.0, 32.0, 64.0, 256.0, float("inf"))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PackedTextures:
    """Quad-packed RGBA8 texture array (layout 2 above).
    flat[q] = [c(y0,x0), c(y0,x1), c(y1,x0), c(y1,x1)] as packed RGBA8
    int32; per level the quads lay out as [N, py, px, Qy, Qx, 4] with
    wrap-around baked into the edge quads at pack time.

    pair_flat (optional): PAIR-packed rows [QP, 8] — lanes 0..3 a
    material's diffuse quad, lanes 4..7 its combined-aux quad, for each
    (diffuse, aux) texture pair in use. Diffuse + aux share uv and (at
    zero mip bias) the mip level, so the material pass's two dense
    fetches collapse into ONE 32 B row gather — texture cost on TPU is
    fetch-COUNT-bound (~7-10 ms per dense sampled map at 1080p), and a
    32 B coherent row gather costs the same as 16 B (BASELINE.md,
    tools/profile_gather.py). Built by
    TextureManager.combine_pair_quads."""
    flat: jnp.ndarray                                        # [Q, 4] int32
    offs: tuple = field(metadata=dict(static=True), default=())
    sizes: tuple = field(metadata=dict(static=True), default=())
    pair_flat: jnp.ndarray | None = None                     # [QP, 8] int32
    pair_offs: tuple = field(metadata=dict(static=True), default=())


def pack_texture_quads(levels: list[np.ndarray]) -> PackedTextures:
    """levels: per mip [N, s, s, 4] f32 in [0,1] -> PackedTextures."""
    parts, offs, sizes = [], [], []
    off = 0
    for lvl in levels:
        n, s = lvl.shape[0], lvl.shape[1]
        q = (s + 1) // 2
        u8 = np.clip(np.rint(np.asarray(lvl, np.float32) * 255.0),
                     0, 255).astype(np.uint32)
        packed = (u8[..., 0] | (u8[..., 1] << 8)
                  | (u8[..., 2] << 16) | (u8[..., 3] << 24))   # [N, s, s]
        quad = np.zeros((n, 2, 2, q, q, 4), np.uint32)
        base = np.arange(q) * 2
        for py in range(2):
            y0 = (base + py) % s
            y1 = (base + py + 1) % s
            for px in range(2):
                x0 = (base + px) % s
                x1 = (base + px + 1) % s
                quad[:, py, px, :, :, 0] = packed[:, y0][:, :, x0]
                quad[:, py, px, :, :, 1] = packed[:, y0][:, :, x1]
                quad[:, py, px, :, :, 2] = packed[:, y1][:, :, x0]
                quad[:, py, px, :, :, 3] = packed[:, y1][:, :, x1]
        parts.append(quad.reshape(-1, 4).view(np.int32))
        offs.append(off)
        sizes.append(s)
        off += parts[-1].shape[0]
    return PackedTextures(flat=jnp.asarray(np.concatenate(parts)),
                          offs=tuple(offs), sizes=tuple(sizes))


def pack_texture_pairs(levels: list[np.ndarray], pairs: list[tuple],
                       packed: PackedTextures) -> PackedTextures:
    """Augment `packed` with PAIR-packed rows for each (diffuse_id,
    aux_id) pair: one [QP, 8] row per 2x2 footprint holding both quads.
    ids of -1 take a neutral image (diffuse white; aux = flat normal,
    unit roughness/metalness multipliers) so the has()-masking in the
    material pass stays the only gate."""
    parts, offs = [], []
    off = 0
    for lvl in levels:
        n, s = lvl.shape[0], lvl.shape[1]
        q = (s + 1) // 2
        lvl = np.asarray(lvl, np.float32)
        neutral_d = np.ones((1, s, s, 4), np.float32)
        neutral_a = np.empty((1, s, s, 4), np.float32)
        neutral_a[..., 0:2] = 0.5
        neutral_a[..., 2:4] = 1.0
        src = np.concatenate([lvl, neutral_d, neutral_a], axis=0)
        d_sel = np.asarray([p[0] if p[0] >= 0 else n for p in pairs])
        a_sel = np.asarray([p[1] if p[1] >= 0 else n + 1 for p in pairs])
        u8 = np.clip(np.rint(src * 255.0), 0, 255).astype(np.uint32)
        pk = (u8[..., 0] | (u8[..., 1] << 8)
              | (u8[..., 2] << 16) | (u8[..., 3] << 24))       # [N+2, s, s]
        dq = pk[d_sel]
        aq = pk[a_sel]
        quad = np.zeros((len(pairs), 2, 2, q, q, 8), np.uint32)
        base = np.arange(q) * 2
        for py in range(2):
            y0 = (base + py) % s
            y1 = (base + py + 1) % s
            for px in range(2):
                x0 = (base + px) % s
                x1 = (base + px + 1) % s
                for lane, img in ((0, dq), (4, aq)):
                    quad[:, py, px, :, :, lane + 0] = img[:, y0][:, :, x0]
                    quad[:, py, px, :, :, lane + 1] = img[:, y0][:, :, x1]
                    quad[:, py, px, :, :, lane + 2] = img[:, y1][:, :, x0]
                    quad[:, py, px, :, :, lane + 3] = img[:, y1][:, :, x1]
        parts.append(quad.reshape(-1, 8).view(np.int32))
        offs.append(off)
        off += parts[-1].shape[0]
    return PackedTextures(flat=packed.flat, offs=packed.offs,
                          sizes=packed.sizes,
                          pair_flat=jnp.asarray(np.concatenate(parts)),
                          pair_offs=tuple(offs))


def _bilerp_rgba8(w: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                  lane0: int) -> jnp.ndarray:
    """Bilinear blend of 4 packed-RGBA8 lanes [..., lane0:lane0+4]."""
    def rgba(v):
        return jnp.stack([(v & 0xFF).astype(jnp.float32),
                          ((v >> 8) & 0xFF).astype(jnp.float32),
                          ((v >> 16) & 0xFF).astype(jnp.float32),
                          (v >> 24).astype(jnp.float32)], axis=-1) / 255.0

    fx = fx[..., None]
    fy = fy[..., None]
    top = (rgba(w[..., lane0 + 0]) * (1 - fx)
           + rgba(w[..., lane0 + 1]) * fx)
    bot = (rgba(w[..., lane0 + 2]) * (1 - fx)
           + rgba(w[..., lane0 + 3]) * fx)
    return top * (1 - fy) + bot * fy


def _packed_pair_tap(pt: PackedTextures, pair_id: jnp.ndarray,
                     uv: jnp.ndarray, lodi: jnp.ndarray):
    """One bilinear tap of a (diffuse, aux) pair: ONE 32 B row gather ->
    (diffuse rgba, aux rgba)."""
    shape = uv.shape[:-1]
    idx = jnp.zeros(shape, jnp.int32)
    fx = jnp.zeros(shape, jnp.float32)
    fy = jnp.zeros(shape, jnp.float32)
    t = jnp.maximum(pair_id, 0)
    for m, s in enumerate(pt.sizes):
        q = (s + 1) // 2
        x = uv[..., 0] * s - 0.5
        y = uv[..., 1] * s - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x0i = jnp.mod(x0.astype(jnp.int32), s)
        y0i = jnp.mod(y0.astype(jnp.int32), s)
        px, qx = x0i & 1, x0i >> 1
        py, qy = y0i & 1, y0i >> 1
        cand = pt.pair_offs[m] + (((t * 2 + py) * 2 + px) * q + qy) * q + qx
        hit = lodi == m
        idx = jnp.where(hit, cand, idx)
        fx = jnp.where(hit, x - x0, fx)
        fy = jnp.where(hit, y - y0, fy)
    rows = pt.pair_flat[idx]                    # [..., 8] ONE row gather
    w = jax.lax.bitcast_convert_type(rows, jnp.uint32)
    return _bilerp_rgba8(w, fx, fy, 0), _bilerp_rgba8(w, fx, fy, 4)


def sample_texture_pair_aniso(pt: PackedTextures, pair_id: jnp.ndarray,
                              diffuse_id: jnp.ndarray, uv: jnp.ndarray,
                              num_taps: int = 8, max_aniso: float = 8.0,
                              jitter: jnp.ndarray | None = None,
                              adaptive_frac: int | None = 16,
                              telemetry: dict | None = None):
    """Anisotropic (diffuse, aux) sample from the pair-packed table:
    ONE dense 32 B row gather covers the diffuse base tap AND the
    combined-aux tap (they share uv; at zero mip bias the aux mip equals
    the aniso-clamped diffuse mip — log2(rho_major * size) — to the
    texel). High-anisotropy pixels then refine the DIFFUSE channel with
    the compacted ellipse walk of sample_texture_array_aniso (aux maps
    are low-frequency; the walk doesn't pay for them, matching the
    unpaired path). Returns (diffuse rgba, aux rgba)."""
    lod_m, major, ratio, ratio_raw = uv_mip_level_aniso(
        uv, tex_base_size(pt), tex_num_levels(pt) - 1, max_aniso=max_aniso)
    max_lod = tex_num_levels(pt) - 1
    lod1 = jnp.clip(lod_m + jnp.log2(jnp.maximum(ratio, 1.0)), 0.0, max_lod)
    if jitter is not None:
        lodi = jnp.clip(jnp.floor(lod1 + jitter).astype(jnp.int32),
                        0, max_lod)
        diffuse, aux = _packed_pair_tap(pt, pair_id, uv, lodi)
    else:
        l0 = jnp.clip(jnp.floor(lod1).astype(jnp.int32), 0, max_lod)
        l1 = jnp.minimum(l0 + 1, max_lod)
        wgt = jnp.clip(lod1 - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
        d0, a0 = _packed_pair_tap(pt, pair_id, uv, l0)
        d1, a1 = _packed_pair_tap(pt, pair_id, uv, l1)
        diffuse = d0 * (1 - wgt) + d1 * wgt
        aux = a0 * (1 - wgt) + a1 * wgt
    if num_taps <= 1 or adaptive_frac is None:
        return diffuse, aux

    from . import sparse
    n = int(np.prod(ratio.shape))
    cap = -(-max(512, n // adaptive_frac) // 8) * 8
    thr, _db = sparse.adaptive_threshold(ratio_raw, ANISO_THRS, cap, block=8)
    active = ratio_raw > thr
    idx, count, demand = sparse.compact_indices(active, cap, block=8)
    if telemetry is not None:
        telemetry["tex_aniso"] = demand.astype(jnp.float32) / cap
        telemetry["tex_aniso_demand"] = sparse.block_count(
            ratio_raw > ANISO_THRS[0], 8).astype(jnp.float32) * 8 / cap
    live = (jnp.arange(cap) < count) & active.reshape(-1)[idx]

    def g(v):
        return v.reshape((-1,) + v.shape[ratio.ndim:])[idx]

    out_c = _aniso_taps(pt, g(diffuse_id), g(uv), g(major), g(ratio),
                        g(lod_m), num_taps,
                        None if jitter is None else g(jitter))
    nc = diffuse.shape[-1]
    flat = diffuse.reshape(-1, nc)
    dest = jnp.where(live, idx, n)
    flat = flat.at[dest].set(out_c, mode="drop")
    return flat.reshape(diffuse.shape), aux


def sample_texture_pair(pt: PackedTextures, pair_id: jnp.ndarray,
                        uv: jnp.ndarray, lod: jnp.ndarray,
                        jitter: jnp.ndarray | None = None):
    """Trilinear (diffuse, aux) pair sample at a precomputed isotropic
    lod — the aniso_taps<=1 counterpart of sample_texture_pair_aniso.
    Stochastic single tap with jitter (1 row gather), else 2-tap mip
    blend."""
    max_lod = len(pt.sizes) - 1
    if jitter is not None:
        lodi = jnp.clip(jnp.floor(lod + jitter).astype(jnp.int32),
                        0, max_lod)
        return _packed_pair_tap(pt, pair_id, uv, lodi)
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, max_lod)
    l1 = jnp.minimum(l0 + 1, max_lod)
    w = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
    d0, a0 = _packed_pair_tap(pt, pair_id, uv, l0)
    d1, a1 = _packed_pair_tap(pt, pair_id, uv, l1)
    return d0 * (1 - w) + d1 * w, a0 * (1 - w) + a1 * w


def _packed_tap(pt: PackedTextures, tex_id: jnp.ndarray, uv: jnp.ndarray,
                lodi: jnp.ndarray) -> jnp.ndarray:
    """One bilinear tap from the quad-packed table: ONE row gather."""
    shape = uv.shape[:-1]
    idx = jnp.zeros(shape, jnp.int32)
    fx = jnp.zeros(shape, jnp.float32)
    fy = jnp.zeros(shape, jnp.float32)
    t = jnp.maximum(tex_id, 0)
    for m, s in enumerate(pt.sizes):
        q = (s + 1) // 2
        x = uv[..., 0] * s - 0.5
        y = uv[..., 1] * s - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x0i = jnp.mod(x0.astype(jnp.int32), s)
        y0i = jnp.mod(y0.astype(jnp.int32), s)
        px, qx = x0i & 1, x0i >> 1
        py, qy = y0i & 1, y0i >> 1
        cand = pt.offs[m] + (((t * 2 + py) * 2 + px) * q + qy) * q + qx
        hit = lodi == m
        idx = jnp.where(hit, cand, idx)
        fx = jnp.where(hit, x - x0, fx)
        fy = jnp.where(hit, y - y0, fy)
    rows = pt.flat[idx]                          # [..., 4] ONE row gather
    w = jax.lax.bitcast_convert_type(rows, jnp.uint32)

    def rgba(v):
        return jnp.stack([(v & 0xFF).astype(jnp.float32),
                          ((v >> 8) & 0xFF).astype(jnp.float32),
                          ((v >> 16) & 0xFF).astype(jnp.float32),
                          (v >> 24).astype(jnp.float32)], axis=-1) / 255.0

    fx = fx[..., None]
    fy = fy[..., None]
    top = rgba(w[..., 0]) * (1 - fx) + rgba(w[..., 1]) * fx
    bot = rgba(w[..., 2]) * (1 - fx) + rgba(w[..., 3]) * fx
    return top * (1 - fy) + bot * fy


def uv_gradients(uv: jnp.ndarray):
    """Screen-space uv derivative vectors (the hardware ddx/ddy):
    uv [H, W, 2] -> (duv_dx [H, W, 2], duv_dy [H, W, 2])."""
    # edge-clamped backward differences: the first row/column's neighbor
    # is itself (gradient 0) rather than jnp.roll's wrap to the opposite
    # frame edge — the wrap polluted border LODs with cross-frame uv jumps
    # and broke parity with the band renderer's clamped halo exchange
    duv_dx = uv - jnp.concatenate([uv[:, :1], uv[:, :-1]], axis=1)
    duv_dy = uv - jnp.concatenate([uv[:1], uv[:-1]], axis=0)
    return duv_dx, duv_dy


def uv_mip_level(uv: jnp.ndarray, tex_size: int, max_mip: int,
                 bias: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Per-pixel LOD from screen-space uv derivatives (the hardware
    ddx/ddy): uv [H, W, 2] -> lod [H, W]."""
    duv_dx, duv_dy = uv_gradients(uv)
    rho = jnp.sqrt(jnp.maximum((duv_dx ** 2).sum(-1), (duv_dy ** 2).sum(-1)))
    lod = jnp.log2(jnp.maximum(rho * tex_size, 1e-6)) + bias
    return jnp.clip(lod, 0.0, max_mip)


def uv_mip_level_aniso(uv: jnp.ndarray, tex_size: int, max_mip: int,
                       max_aniso: float = 4.0,
                       bias: jnp.ndarray | float = 0.0):
    """Anisotropic LOD (the AnisoSampler's footprint math): the sample
    footprint is an ellipse with axes |duv_dx|, |duv_dy|; LOD follows the
    MINOR axis (sharp) and N taps march along the major axis to cover the
    rest. -> (lod [H,W], major_step [H,W,2] uv-space, ratio [H,W])."""
    duv_dx, duv_dy = uv_gradients(uv)
    lx = jnp.sqrt((duv_dx ** 2).sum(-1))
    ly = jnp.sqrt((duv_dy ** 2).sum(-1))
    major_is_x = lx >= ly
    rho_maj = jnp.maximum(jnp.maximum(lx, ly), 1e-12)
    rho_min = jnp.maximum(jnp.minimum(lx, ly), 1e-12)
    ratio_raw = rho_maj / rho_min
    ratio = jnp.minimum(ratio_raw, max_aniso)
    # LOD so that (#taps = ratio) x (minor footprint) covers the ellipse
    lod = jnp.log2(jnp.maximum(rho_maj / ratio * tex_size, 1e-6)) + bias
    major = jnp.where(major_is_x[..., None], duv_dx, duv_dy)
    # ratio_raw (UNCLAMPED) rides along for the adaptive-walk ladder: it
    # orders pixels WITHIN the clamped tier by true anisotropy, which the
    # clamped ratio cannot (every grazing pixel reads exactly max_aniso)
    return jnp.clip(lod, 0.0, max_mip), major, ratio, ratio_raw


def _bilinear_from_level(level: jnp.ndarray, tex_id: jnp.ndarray,
                         uv: jnp.ndarray) -> jnp.ndarray:
    """level [N, s, s, 4], tex_id [H, W], uv [H, W, 2] (wrap) -> [H, W, 4]."""
    s = level.shape[1]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), s)
    x1i = jnp.mod(x0i + 1, s)
    y0i = jnp.mod(y0.astype(jnp.int32), s)
    y1i = jnp.mod(y0i + 1, s)
    t = jnp.maximum(tex_id, 0)
    c00 = level[t, y0i, x0i]
    c10 = level[t, y0i, x1i]
    c01 = level[t, y1i, x0i]
    c11 = level[t, y1i, x1i]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def _flatten_mips(mips: list[jnp.ndarray]):
    """Flatten all (texture, mip) levels into ONE [M, 4] row table so the
    per-pixel level pick happens in index arithmetic — a full bilinear
    sample is exactly 4 row gathers total, not 4 per level (TPU gathers
    are the cost; the level where-selects are cheap VPU ops)."""
    flat_parts, offs = [], []
    off = 0
    for level in mips:
        n, s = level.shape[0], level.shape[1]
        flat_parts.append(level.reshape(-1, 4))
        offs.append(off)
        off += n * s * s
    return jnp.concatenate(flat_parts, axis=0), offs


def _bilinear_indices(mips, offs, t, uv, lodi):
    """Per-pixel flat-table corner indices + filter fractions for an int
    mip map lodi [H,W] -> (i00, i10, i01, i11, fx, fy)."""
    shape = uv.shape[:-1]
    i00 = jnp.zeros(shape, jnp.int32)
    i10 = jnp.zeros(shape, jnp.int32)
    i01 = jnp.zeros(shape, jnp.int32)
    i11 = jnp.zeros(shape, jnp.int32)
    fx = jnp.zeros(shape, jnp.float32)
    fy = jnp.zeros(shape, jnp.float32)
    for m, level in enumerate(mips):
        s = level.shape[1]
        if s < 1:
            continue
        x = uv[..., 0] * s - 0.5
        y = uv[..., 1] * s - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x0i = jnp.mod(x0.astype(jnp.int32), s)
        x1i = jnp.mod(x0i + 1, s)
        y0i = jnp.mod(y0.astype(jnp.int32), s)
        y1i = jnp.mod(y0i + 1, s)
        base = offs[m] + t * (s * s)
        hit = lodi == m
        i00 = jnp.where(hit, base + y0i * s + x0i, i00)
        i10 = jnp.where(hit, base + y0i * s + x1i, i10)
        i01 = jnp.where(hit, base + y1i * s + x0i, i01)
        i11 = jnp.where(hit, base + y1i * s + x1i, i11)
        fx = jnp.where(hit, x - x0, fx)
        fy = jnp.where(hit, y - y0, fy)
    return i00, i10, i01, i11, fx[..., None], fy[..., None]


def _bilinear_fetch(flat, idx):
    i00, i10, i01, i11, fx, fy = idx
    c00 = flat[i00].astype(jnp.float32)
    c10 = flat[i10].astype(jnp.float32)
    c01 = flat[i01].astype(jnp.float32)
    c11 = flat[i11].astype(jnp.float32)
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def tex_base_size(textures) -> int:
    """Base (level 0) texel size for either storage layout."""
    if isinstance(textures, PackedTextures):
        return textures.sizes[0]
    return textures[0].shape[1]


def tex_num_levels(textures) -> int:
    if isinstance(textures, PackedTextures):
        return len(textures.sizes)
    return len(textures)


def mip_jitter(h: int, w: int, y_offset=0) -> jnp.ndarray:
    """Per-pixel R2 low-discrepancy jitter in [0,1) for stochastic
    trilinear (see sample_texture_array). y_offset shifts the pattern to
    global frame rows so screen-band sharding reproduces the single-chip
    dither exactly."""
    g = 1.32471795724474602596  # plastic constant
    a1, a2 = 1.0 / g, 1.0 / (g * g)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] + y_offset
    return (a1 * xs + a2 * ys) % 1.0


def sample_texture_array(mips, tex_id: jnp.ndarray,
                         uv: jnp.ndarray, lod: jnp.ndarray | None = None,
                         trilinear: bool = True,
                         jitter: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mip-mapped sample: mips is a list of [N, s_m, s_m, 4] levels or a
    PackedTextures; tex_id [H, W] (negative = slot unused; callers mask via
    Has*Map), uv [H, W, 2] -> rgba [H, W, 4]. Trilinear by default — the
    reference samples material maps with linear-mip samplers
    (ForwardLighting.hlsl:81-102); trilinear=False falls back to
    nearest-mip bilinear. Gather cost: packed = 1 row gather per tap
    (2 trilinear), f32 = 4 per tap (8 trilinear).

    jitter [H, W] in [0,1) enables STOCHASTIC trilinear: the mip blend
    becomes a dithered selection (floor(lod + jitter)) — the trilinear
    curve in expectation at HALF the fetches (texture sampling is
    fetch-count-bound on TPU, ~6 ms per sampled map per 1080p frame).
    The R2 dither (mip_jitter) keeps the error blue-noise distributed."""
    if lod is None:
        lod = uv_mip_level(uv, tex_base_size(mips), tex_num_levels(mips) - 1)
    if isinstance(mips, PackedTextures):
        max_m = len(mips.sizes) - 1
        if jitter is not None and trilinear:
            lodi = jnp.clip(jnp.floor(lod + jitter).astype(jnp.int32),
                            0, max_m)
            return _packed_tap(mips, tex_id, uv, lodi)
        if not trilinear:
            lodi = jnp.clip(lod.astype(jnp.int32), 0, max_m)
            return _packed_tap(mips, tex_id, uv, lodi)
        l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, max_m)
        l1 = jnp.minimum(l0 + 1, max_m)
        w = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
        c0 = _packed_tap(mips, tex_id, uv, l0)
        c1 = _packed_tap(mips, tex_id, uv, l1)
        return c0 * (1.0 - w) + c1 * w
    flat, offs = _flatten_mips(mips)
    t = jnp.maximum(tex_id, 0)
    max_m = len(mips) - 1
    if jitter is not None and trilinear:
        lodi = jnp.clip(jnp.floor(lod + jitter).astype(jnp.int32), 0, max_m)
        return _bilinear_fetch(flat, _bilinear_indices(mips, offs, t, uv, lodi))
    if not trilinear:
        lodi = jnp.clip(lod.astype(jnp.int32), 0, max_m)
        return _bilinear_fetch(flat, _bilinear_indices(mips, offs, t, uv, lodi))
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, max_m)
    l1 = jnp.minimum(l0 + 1, max_m)
    w = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
    c0 = _bilinear_fetch(flat, _bilinear_indices(mips, offs, t, uv, l0))
    c1 = _bilinear_fetch(flat, _bilinear_indices(mips, offs, t, uv, l1))
    return c0 * (1.0 - w) + c1 * w


def _aniso_taps(mips, tex_id, uv, major, ratio, lod_minor, num_taps,
                jitter):
    """num_taps trilinear taps along the major-footprint axis, uniform
    weights; LOD clamps up when the taps can't cover the full ellipse.
    Shape-blind: dense images or compacted flat arrays."""
    span = jnp.minimum(ratio, float(num_taps))
    lod = lod_minor + jnp.log2(jnp.maximum(ratio / span, 1.0))
    lod = jnp.clip(lod, 0.0, tex_num_levels(mips) - 1)
    acc = None
    for i in range(num_taps):
        f = (i + 0.5) / num_taps - 0.5
        uv_i = uv + major * (f * span / jnp.maximum(ratio, 1e-6))[..., None]
        # decorrelate the taps' stochastic mip picks (i/num_taps shift)
        jit_i = None if jitter is None else (jitter + i / num_taps) % 1.0
        c = sample_texture_array(mips, tex_id, uv_i, lod=lod, jitter=jit_i)
        acc = c if acc is None else acc + c
    return acc / num_taps


def sample_texture_array_aniso(mips, tex_id: jnp.ndarray,
                               uv: jnp.ndarray, num_taps: int = 2,
                               max_aniso: float = 8.0,
                               jitter: jnp.ndarray | None = None,
                               adaptive_frac: int | None = None,
                               telemetry: dict | None = None
                               ) -> jnp.ndarray:
    """Anisotropic sample (the AnisoSampler, ForwardLighting.hlsl:81 with
    MaxAnisotropy): trilinear taps along the major-footprint axis, with
    LOD from the minor axis so grazing-angle surfaces keep detail.

    adaptive_frac enables the hardware sampler's economics on TPU, where
    texture cost is fetch-count-bound: anisotropy only exceeds ~1.3 on a
    minority of pixels (grazing floors), so ONE dense aniso-corrected
    trilinear tap covers the isotropic majority and the high-ratio pixels
    are COMPACTED (ops/sparse.py, at most 1 in adaptive_frac of the
    frame) for the full num_taps ellipse walk — num_taps=8 then costs
    ~2 dense taps instead of 8. Pixels past the capacity keep the
    aniso-clamped single tap (over-blurred, never aliased). None = dense
    num_taps everywhere."""
    lod, major, ratio, ratio_raw = uv_mip_level_aniso(
        uv, tex_base_size(mips), tex_num_levels(mips) - 1,
        max_aniso=max_aniso)
    # the adaptive machinery costs ~1 dense tap (compaction scatter +
    # per-field gathers + result scatter); below 3 taps just walking the
    # ellipse densely is cheaper (r4 ladder: adaptive aniso2 cost +93
    # ms/frame where dense 2-tap measures ~29, tools/profile_texscale.py)
    if adaptive_frac is None or num_taps <= 2:
        return _aniso_taps(mips, tex_id, uv, major, ratio, lod, num_taps,
                           jitter)

    from . import sparse
    # dense base: single trilinear at the isotropically-clamped LOD
    # (exact for ratio ~ 1; over-blurred at grazing angles)
    max_lod = tex_num_levels(mips) - 1
    lod1 = jnp.clip(lod + jnp.log2(jnp.maximum(ratio, 1.0)), 0.0, max_lod)
    base = sample_texture_array(mips, tex_id, uv, lod=lod1, jitter=jitter)

    n = int(np.prod(ratio.shape))
    cap = -(-max(512, n // adaptive_frac) // 8) * 8
    # capacity-aware activation threshold: the walk budget goes to the
    # MOST anisotropic pixels (stress frames can have >2x cap of pixels
    # past the base 1.3 ratio — raster-order truncation would walk the
    # top of the frame and clamp the bottom). Pixels below the chosen
    # threshold keep the aniso-clamped single tap: over-blurred, never
    # aliased, worst-first budget spend. The ladder scores the UNCLAMPED
    # ratio (see ANISO_THRS).
    thr, _db = sparse.adaptive_threshold(ratio_raw, ANISO_THRS, cap, block=8)
    active = ratio_raw > thr
    # block=8: high-anisotropy pixels are grazing-angle floors — long
    # raster-order runs — so blocks stay near-full and the compaction
    # scatter (the dominant cost at 1080p) shrinks 8x
    idx, count, demand = sparse.compact_indices(active, cap, block=8)
    if telemetry is not None:
        # chosen-threshold saturation (<= 1 unless even the top threshold
        # overflows — then LOUD); *_demand = the unbudgeted base-threshold
        # demand, informational (engine telemetry, not asserted)
        telemetry["tex_aniso"] = demand.astype(jnp.float32) / cap
        telemetry["tex_aniso_demand"] = sparse.block_count(
            ratio_raw > ANISO_THRS[0], 8).astype(jnp.float32) * 8 / cap
    live = (jnp.arange(cap) < count) & active.reshape(-1)[idx]

    def g(v):
        return v.reshape((-1,) + v.shape[ratio.ndim:])[idx]

    out_c = _aniso_taps(mips, g(tex_id), g(uv), g(major), g(ratio),
                        g(lod), num_taps,
                        None if jitter is None else g(jitter))
    nc = base.shape[-1]
    flat = base.reshape(-1, nc)
    dest = jnp.where(live, idx, n)
    flat = flat.at[dest].set(out_c, mode="drop")
    return flat.reshape(base.shape)


def unpack_normal_map_xy(sampled_xy: jnp.ndarray, world_normal: jnp.ndarray,
                         world_tangent: jnp.ndarray) -> jnp.ndarray:
    """unpack_normal_map for the combined-aux layout: only x,y stored
    (z = sqrt(1 - x^2 - y^2), tangent-space normals point outward)."""
    xy = sampled_xy * 2.0 - 1.0
    z = jnp.sqrt(jnp.maximum(1.0 - (xy * xy).sum(-1, keepdims=True), 0.0))
    return unpack_normal_map(
        jnp.concatenate([xy, z], axis=-1) * 0.5 + 0.5,
        world_normal, world_tangent)


def unpack_normal_map(sampled: jnp.ndarray, world_normal: jnp.ndarray,
                      world_tangent: jnp.ndarray) -> jnp.ndarray:
    """UnpackNormal (ShadingMath.hlsl:44-52): tangent-space normal map ->
    world space via Gram-Schmidt TBN."""
    n_ts = sampled * 2.0 - 1.0
    n = world_normal / jnp.maximum(
        jnp.linalg.norm(world_normal, axis=-1, keepdims=True), 1e-9)
    t = world_tangent - (n * world_tangent).sum(-1, keepdims=True) * n
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(t, n)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
    out = n_ts[..., 0:1] * t + n_ts[..., 1:2] * b + n_ts[..., 2:3] * n
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)