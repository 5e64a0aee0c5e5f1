"""Quad-domain patch tessellation — the TPU-native counterpart of the
reference's hull/domain-shader pipeline (Shaders/Tessellation.hlsl:1-675,
Tessellation.h:53-59: tri+quad domains, fractional partitioning, adaptive
distance-based factors, HS frustum culling; patch meshes from
MeshGenerator.h).

GPU tessellation amplifies patches with DYNAMIC vertex counts; XLA needs
static shapes. The TPU-native restructuring: every live patch amplifies
through a STATIC template grid at the maximum level (MAX_SEGS x MAX_SEGS
quads), and the per-frame factor moves the template vertices' parametric
coordinates instead of changing counts — vertices beyond the live level
COLLAPSE onto their neighbors (fractional-odd snapping below), producing
zero-area triangles the raster setup kills for free. Cost is therefore
static (the max-level vertex transform, ~free on the VPU) while the
VISIBLE refinement is continuous in the factor, exactly like hardware
fractional-odd partitioning.

Crack-free seams: factors are computed PER EDGE from the edge midpoint's
view distance (the reference HS's per-edge factors,
Tessellation.hlsl ComputePatchConstants). Neighboring patches share the
edge midpoint, so they compute IDENTICAL factors and their boundary
vertices snap to identical positions — no T-junctions, no cracks.

Fractional-odd snapping (the D3D FRACTIONAL_ODD partitioner's behavior):
for a continuous factor f >= 1 the edge splits into n = ceil_odd(f)
segments; the two OUTERMOST segments have fractional length
e = (f - (n - 2)) / (2 f) growing from 0 (vertices emerge AT the
endpoints and slide inward), the inner n-2 segments stay uniform. At
f = 1 every interior vertex sits on an endpoint -> the patch renders as
its 2-triangle control quad exactly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# template resolution: MAX_SEGS segments per edge (must be odd for the
# fractional-odd ladder to top out exactly uniform)
MAX_SEGS = 7


def build_patch_template(max_segs: int = MAX_SEGS):
    """Static template for one quad patch: parametric vertex grid and
    triangle index list.

    Returns (params [V, 2] f32 in [0,1]^2 with V=(max_segs+1)^2,
    tri_idx [T, 3] int32 with T=2*max_segs^2). Triangles alternate
    diagonals per cell (matches MeshGenerator.h's grid winding)."""
    m = max_segs
    us, vs = np.meshgrid(np.arange(m + 1) / m, np.arange(m + 1) / m,
                         indexing="xy")
    params = np.stack([us.reshape(-1), vs.reshape(-1)],
                      axis=-1).astype(np.float32)
    tris = []
    for j in range(m):
        for i in range(m):
            v00 = j * (m + 1) + i
            v10 = v00 + 1
            v01 = v00 + (m + 1)
            v11 = v01 + 1
            if (i + j) % 2 == 0:
                tris.append((v00, v01, v10))
                tris.append((v10, v01, v11))
            else:
                tris.append((v00, v01, v11))
                tris.append((v00, v11, v10))
    return params, np.asarray(tris, np.int32)


def frac_odd_snap(u: jnp.ndarray, f: jnp.ndarray,
                  max_segs: int = MAX_SEGS) -> jnp.ndarray:
    """Fractional-odd parametric snap: template coordinate u in [0,1]
    (at max_segs uniform segments) -> live coordinate under continuous
    factor f (broadcastable with u; clamped to [1, max_segs]).

    Vertex identity is the CENTER OFFSET s = i - max_segs/2 (a
    half-integer for odd max_segs): hardware fractional-odd inserts each
    new vertex pair AT the endpoints (e -> 0 right after n jumps) and
    slides it inward, so labeling live vertices center-out keeps every
    vertex's position continuous across the odd-integer factor
    transitions — labeling them from the boundary (j = round(i*n/m))
    would teleport interior vertices by a whole segment at each jump.
    Template vertices beyond the live range |s| > n/2 collapse onto the
    endpoints. Inner position: p = 0.5 + s * (1-2e)/(n-2) with
    e = (f - (n-2)) / (2 f), which hits e at |s| = n/2 - 1 and matches
    the uniform grid exactly at f = max_segs."""
    m = float(max_segs)
    f = jnp.clip(f, 1.0, m)
    # smallest odd integer >= f (n >= 1)
    n = 2.0 * jnp.ceil((f - 1.0) / 2.0) + 1.0
    e = (f - (n - 2.0)) / (2.0 * f)
    s = u * m - 0.5 * m                          # signed center offset
    sc = jnp.clip(s, -0.5 * n, 0.5 * n)          # collapse to endpoints
    # n == 1 has no interior vertices (everything collapses); guard the
    # 0/0 with a safe denominator, the where() picks the endpoint branch
    denom = jnp.maximum(n - 2.0, 1.0)
    p_in = 0.5 + sc * (1.0 - 2.0 * e) / denom
    p = jnp.where(sc <= -0.5 * n, 0.0,
                  jnp.where(sc >= 0.5 * n, 1.0, p_in))
    return p


def edge_factors(corners_world: jnp.ndarray, camera_pos: jnp.ndarray,
                 tess_scale: jnp.ndarray | float,
                 max_segs: int = MAX_SEGS):
    """Adaptive distance-based factors (Tessellation.hlsl's
    ComputePatchConstants distance mapping): one factor per patch EDGE
    from its midpoint's camera distance, plus the inner factor.

    corners_world [P, 4, 3] (order: (0,0), (1,0), (0,1), (1,1) in (u,v)).
    tess_scale: world distance at which the factor halves (factor =
    max_segs * tess_scale / dist, clamped to [1, max_segs]).
    Returns (fu0, fu1, fv0, fv1, f_inner), each [P]: fu0/fu1 apply to the
    v=0 / v=1 edges (u-direction splits), fv0/fv1 to u=0 / u=1."""
    c00, c10, c01, c11 = (corners_world[:, 0], corners_world[:, 1],
                          corners_world[:, 2], corners_world[:, 3])

    def fac(mid):
        d = jnp.linalg.norm(mid - camera_pos, axis=-1)
        return jnp.clip(max_segs * tess_scale / jnp.maximum(d, 1e-3),
                        1.0, float(max_segs))

    fu0 = fac(0.5 * (c00 + c10))        # v = 0 edge
    fu1 = fac(0.5 * (c01 + c11))        # v = 1 edge
    fv0 = fac(0.5 * (c00 + c01))        # u = 0 edge
    fv1 = fac(0.5 * (c10 + c11))        # u = 1 edge
    f_inner = 0.25 * (fu0 + fu1 + fv0 + fv1)
    return fu0, fu1, fv0, fv1, f_inner


def snap_params(params: jnp.ndarray, fu0, fu1, fv0, fv1, f_inner,
                max_segs: int = MAX_SEGS) -> jnp.ndarray:
    """Apply fractional-odd snapping to the template grid per patch.

    params [V, 2]; factors [P] each -> snapped [P, V, 2]. Boundary rows
    use their edge's factor (shared-midpoint factors -> crack-free);
    interior vertices use the inner factor (the DS inside factors)."""
    u = params[None, :, 0]
    v = params[None, :, 1]
    on_v0 = v <= 0.0
    on_v1 = v >= 1.0
    on_u0 = u <= 0.0
    on_u1 = u >= 1.0
    f_u = jnp.where(on_v0, fu0[:, None],
                    jnp.where(on_v1, fu1[:, None], f_inner[:, None]))
    f_v = jnp.where(on_u0, fv0[:, None],
                    jnp.where(on_u1, fv1[:, None], f_inner[:, None]))
    su = frac_odd_snap(u, f_u, max_segs)
    sv = frac_odd_snap(v, f_v, max_segs)
    return jnp.stack([su, sv], axis=-1)                     # [P, V, 2]


def eval_patches(corners: jnp.ndarray, uv01: jnp.ndarray) -> jnp.ndarray:
    """Bilinear quad-patch evaluation (the DS's position interpolation):
    corners [P, 4, C] (order (0,0),(1,0),(0,1),(1,1)), uv01 [P, V, 2] ->
    [P, V, C]."""
    u = uv01[..., 0:1]
    v = uv01[..., 1:2]
    c00, c10, c01, c11 = (corners[:, None, 0], corners[:, None, 1],
                          corners[:, None, 2], corners[:, None, 3])
    return ((c00 * (1 - u) + c10 * u) * (1 - v)
            + (c01 * (1 - u) + c11 * u) * v)


def displace(positions: jnp.ndarray, normals: jnp.ndarray,
             uv: jnp.ndarray, heightmap: jnp.ndarray,
             scale: jnp.ndarray | float) -> jnp.ndarray:
    """Heightmap displacement along the patch normal (the DS's
    displacement sampling, Tessellation.hlsl DomainShader + the Terrain
    material's heightmap): bilinear height at uv (edge-clamped), positions
    + n * h * scale. uv/positions/normals [P, V, .]; heightmap [Hh, Wh]."""
    hh, wh = heightmap.shape
    x = jnp.clip(uv[..., 0] * (wh - 1), 0.0, wh - 1.0)
    y = jnp.clip(uv[..., 1] * (hh - 1), 0.0, hh - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, wh - 1)
    y1i = jnp.minimum(y0i + 1, hh - 1)
    flat = heightmap.reshape(-1)
    h00 = flat[y0i * wh + x0i][..., None]
    h10 = flat[y0i * wh + x1i][..., None]
    h01 = flat[y1i * wh + x0i][..., None]
    h11 = flat[y1i * wh + x1i][..., None]
    h = ((h00 * (1 - fx) + h10 * fx) * (1 - fy)
         + (h01 * (1 - fx) + h11 * fx) * fy)
    return positions + normals * h * scale


def cull_patches(corners_world: jnp.ndarray, frustum_planes: jnp.ndarray,
                 slack: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Per-patch frustum cull (the HS's culled-patch zero-factor path,
    Tessellation.hlsl frustum culling): a patch survives unless all 4
    control corners sit outside one plane (conservative; `slack` expands
    for displacement). corners_world [P, 4, 3], planes [6, 4] -> [P]."""
    c4 = jnp.concatenate([corners_world,
                          jnp.ones_like(corners_world[..., :1])], axis=-1)
    d = jnp.einsum("kj,pcj->pkc", frustum_planes, c4)       # [P, 6, 4]
    outside_any_plane = (d < -slack).all(axis=2).any(axis=1)
    return ~outside_any_plane


def build_tri_template(max_segs: int = MAX_SEGS):
    """Static template for one TRIANGLE patch (the reference's tri-domain
    hull/domain path, Tessellation.hlsl "domain(tri)"): barycentric
    vertex grid at max_segs uniform subdivisions and its triangle list.

    Returns (bary [V, 3] f32 with V=(m+1)(m+2)/2 rows summing to 1,
    tri_idx [T, 3] int32 with T = m^2)."""
    m = max_segs
    verts = []
    vid = {}
    for j in range(m + 1):
        for i in range(m + 1 - j):
            vid[(i, j)] = len(verts)
            verts.append((i / m, j / m, (m - i - j) / m))
    tris = []
    for j in range(m):
        for i in range(m - j):
            tris.append((vid[(i, j)], vid[(i + 1, j)], vid[(i, j + 1)]))
            if i < m - j - 1:
                tris.append((vid[(i + 1, j)], vid[(i + 1, j + 1)],
                             vid[(i, j + 1)]))
    return (np.asarray(verts, np.float32),
            np.asarray(tris, np.int32))


def snap_bary(bary: jnp.ndarray, f_e0, f_e1, f_e2, f_inner,
              max_segs: int = MAX_SEGS) -> jnp.ndarray:
    """Fractional-odd snapping on the TRI domain: template barycentrics
    [V, 3] + per-patch edge/inner factors [P] -> snapped [P, V, 3].

    Boundary vertices (some b_k == 0) snap ALONG their edge with that
    edge's factor via the 1-D frac_odd_snap — the snap is symmetric
    (snap(1-t) == 1-snap(t)), so the two patches sharing an edge (which
    parameterize it in opposite directions but compute the same
    midpoint-distance factor) produce IDENTICAL vertex positions:
    crack-free, the same invariant as the quad path.

    Interior vertices snap their RING coordinate rho = 1 - 3*min(b)
    (1 at the boundary, 0 at the centroid) through the 1-D snap's lower
    half (x = rho/2): rings collapse centroid-first as f_inner drops, and
    at f_inner = 1 every interior vertex sits AT the centroid — the patch
    renders as the 3-triangle corner fan of its flat control triangle
    (collapsed sub-triangles detected exactly by parameter equality, as
    in the quad path). Divergence from D3D's ring construction is
    behavioral only (continuous, crack-free, factor-monotone), not
    bitwise; documented in docs/PARITY.md."""
    b0 = bary[None, :, 0]
    b1 = bary[None, :, 1]
    b2 = bary[None, :, 2]
    # edge k = {b_k == 0}: parameterize by the next coordinate cyclically
    on_e0 = b0 <= 0.0
    on_e1 = b1 <= 0.0
    on_e2 = b2 <= 0.0
    boundary = on_e0 | on_e1 | on_e2
    f_edge = jnp.where(on_e0, f_e0[:, None],
                       jnp.where(on_e1, f_e1[:, None], f_e2[:, None]))
    # edge coordinate: on e0 (b0=0) t = b1; on e1 (b1=0) t = b2; on e2 t = b0
    t = jnp.where(on_e0, b1, jnp.where(on_e1, b2, b0))
    ts = frac_odd_snap(t, f_edge, max_segs)
    eb0 = jnp.where(on_e0, 0.0, jnp.where(on_e1, 1.0 - ts, ts))
    eb1 = jnp.where(on_e0, ts, jnp.where(on_e1, 0.0, 1.0 - ts))
    eb2 = 1.0 - eb0 - eb1
    edge_b = jnp.stack([eb0, eb1, eb2], axis=-1)

    # interior: ring coordinate through the 1-D snap's lower half
    bmin = jnp.minimum(b0, jnp.minimum(b1, b2))
    rho = 1.0 - 3.0 * bmin
    x = 0.5 * rho
    xs = frac_odd_snap(x, f_inner[:, None], max_segs)
    rho_s = 2.0 * xs
    scale = jnp.where(rho > 0.0, rho_s / jnp.maximum(rho, 1e-12), 0.0)
    third = 1.0 / 3.0
    inner_b = third + (jnp.stack(
        [b0, b1, b2], axis=-1) - third) * scale[..., None]
    return jnp.where(boundary[..., None], edge_b, inner_b)


def tri_edge_factors(corners_world: jnp.ndarray, camera_pos: jnp.ndarray,
                     tess_scale: jnp.ndarray | float,
                     max_segs: int = MAX_SEGS):
    """Per-edge adaptive factors for TRI patches from edge-midpoint view
    distance (shared midpoints -> shared factors -> crack-free).
    corners_world [P, 3, 3]; edge k sits opposite corner k.
    Returns (f_e0, f_e1, f_e2, f_inner), each [P]."""
    c0, c1, c2 = (corners_world[:, 0], corners_world[:, 1],
                  corners_world[:, 2])

    def fac(mid):
        d = jnp.linalg.norm(mid - camera_pos, axis=-1)
        return jnp.clip(max_segs * tess_scale / jnp.maximum(d, 1e-3),
                        1.0, float(max_segs))

    f_e0 = fac(0.5 * (c1 + c2))
    f_e1 = fac(0.5 * (c2 + c0))
    f_e2 = fac(0.5 * (c0 + c1))
    f_inner = (f_e0 + f_e1 + f_e2) / 3.0
    return f_e0, f_e1, f_e2, f_inner


def eval_tri_patches(corners: jnp.ndarray, bary: jnp.ndarray) -> jnp.ndarray:
    """Barycentric tri-patch evaluation: corners [P, 3, C],
    bary [P, V, 3] -> [P, V, C]."""
    return jnp.einsum("pvk,pkc->pvc", bary, corners)


def amplify_tri(patch_corners: jnp.ndarray, patch_normals: jnp.ndarray,
                patch_uvs: jnp.ndarray, patch_item: jnp.ndarray,
                world: jnp.ndarray, camera_pos: jnp.ndarray,
                frustum_planes: jnp.ndarray,
                bary: jnp.ndarray, tri_idx: jnp.ndarray,
                tess_scale: float,
                heightmap: jnp.ndarray | None = None,
                disp_scale: float = 0.0,
                max_segs: int = MAX_SEGS,
                pad_to: int = 128):
    """TRI-domain amplification — the material-driven tessellation path
    (Material.h's packed tessellation byte: any mesh whose material
    enables tessellation runs through the HS/DS; here its base triangles
    become control patches). Mirrors amplify() for the quad domain:
    static template, per-edge fractional-odd factors, per-patch frustum
    cull, optional heightmap displacement along the control normal with
    recomputed geometric normals. Returns the same corner-table tuple."""
    p = patch_corners.shape[0]
    w_rows = world[patch_item][:, :3, :]
    c4 = jnp.concatenate([patch_corners,
                          jnp.ones_like(patch_corners[..., :1])], axis=-1)
    corners_w = jnp.einsum("pij,pcj->pci", w_rows, c4)        # [P, 3, 3]

    f_e0, f_e1, f_e2, f_inner = tri_edge_factors(
        corners_w, camera_pos, tess_scale, max_segs)
    live = cull_patches(corners_w, frustum_planes,
                        slack=abs(disp_scale) + 1e-3)

    b = snap_bary(bary, f_e0, f_e1, f_e2, f_inner, max_segs)  # [P, V, 3]
    tb = b[:, tri_idx]                                        # [P, T, 3, 3]
    collapsed = ((tb[:, :, 0] == tb[:, :, 1]).all(-1)
                 | (tb[:, :, 1] == tb[:, :, 2]).all(-1)
                 | (tb[:, :, 0] == tb[:, :, 2]).all(-1))

    pos = eval_tri_patches(patch_corners, b)
    nrm = eval_tri_patches(patch_normals, b)
    uv = eval_tri_patches(patch_uvs, b)
    if heightmap is not None and disp_scale != 0.0:
        def surf(bb):
            pp = eval_tri_patches(patch_corners, bb)
            nn = eval_tri_patches(patch_normals, bb)
            tt = eval_tri_patches(patch_uvs, bb)
            return displace(pp, nn, tt, heightmap, disp_scale)

        eps = 0.25 / max_segs
        pos = surf(b)
        # probe along two barycentric directions, flipping where the
        # step would leave the simplex (b0 or b1 can't exceed 1-other)
        du = jnp.where(b[..., 0:1] + eps <= 1.0 - b[..., 1:2], eps, -eps)
        dv = jnp.where(b[..., 1:2] + eps <= 1.0 - b[..., 0:1], eps, -eps)
        zero = jnp.zeros_like(du)
        pu = surf(b + jnp.concatenate([du, zero, -du], axis=-1))
        pv = surf(b + jnp.concatenate([zero, dv, -dv], axis=-1))
        g = jnp.cross(pu - pos, pv - pos)
        flip = jnp.sign((g * nrm).sum(-1, keepdims=True))
        g = g * jnp.where(flip == 0.0, 1.0, flip)
        nrm = g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    # tangent: the c0->c1 control edge (constant per patch, normalized)
    tan = patch_corners[:, None, 1] - patch_corners[:, None, 0]
    tan = jnp.broadcast_to(tan, pos.shape)
    tan = tan / jnp.maximum(
        jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-9)

    t = tri_idx.shape[0]
    flat_idx = (jnp.arange(p)[:, None, None] * pos.shape[1]
                + tri_idx[None, :, :]).reshape(-1)
    corner_pos = pos.reshape(-1, 3)[flat_idx]
    corner_nrm = nrm.reshape(-1, 3)[flat_idx]
    corner_tan = tan.reshape(-1, 3)[flat_idx]
    corner_uv = uv.reshape(-1, 2)[flat_idx]
    tri_item = jnp.repeat(patch_item, t)
    tri_live = jnp.repeat(live, t) & ~collapsed.reshape(-1)

    n_t = p * t
    n_pad = (-n_t) % pad_to
    if n_pad:
        def padr(a):
            widths = ((0, n_pad * (3 if a.shape[0] == 3 * n_t else 1)),) \
                + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, widths)
        corner_pos = padr(corner_pos)
        corner_nrm = padr(corner_nrm)
        corner_tan = padr(corner_tan)
        corner_uv = padr(corner_uv)
        tri_item = padr(tri_item)
        tri_live = jnp.pad(tri_live, (0, n_pad), constant_values=False)
    return corner_pos, corner_nrm, corner_tan, corner_uv, tri_item, tri_live


def amplify(patch_corners: jnp.ndarray, patch_normals: jnp.ndarray,
            patch_uvs: jnp.ndarray, patch_item: jnp.ndarray,
            world: jnp.ndarray, camera_pos: jnp.ndarray,
            frustum_planes: jnp.ndarray,
            params: jnp.ndarray, tri_idx: jnp.ndarray,
            tess_scale: float,
            heightmap: jnp.ndarray | None = None,
            disp_scale: float = 0.0,
            max_segs: int = MAX_SEGS,
            pad_to: int = 128):
    """The full per-frame amplification stage: quad patches -> raster
    corner tables (the HS + tessellator + DS collapsed into one
    vectorized VPU pass).

    patch_corners/normals [P,4,3], patch_uvs [P,4,2] control-point data
    (object space), patch_item [P] item ids, world [N,4,4], params/tri_idx
    from build_patch_template.

    Returns (corner_pos [3T', 3] object space, corner_nrm [3T', 3],
    corner_tan [3T', 3], corner_uv [3T', 2], tri_item [T'],
    tri_live [T'] bool) with T' = P * len(tri_idx) — STATIC shapes;
    culled patches contribute tri_live=False triangles (masked out of the
    raster like cull/LOD masks)."""
    p = patch_corners.shape[0]
    # world-space control corners for factors + cull
    w_rows = world[patch_item][:, :3, :]                     # [P, 3, 4]
    c4 = jnp.concatenate([patch_corners,
                          jnp.ones_like(patch_corners[..., :1])], axis=-1)
    corners_w = jnp.einsum("pij,pcj->pci", w_rows, c4)       # [P, 4, 3]

    fu0, fu1, fv0, fv1, f_inner = edge_factors(
        corners_w, camera_pos, tess_scale, max_segs)
    live = cull_patches(corners_w, frustum_planes,
                        slack=abs(disp_scale) + 1e-3)

    uv01 = snap_params(params, fu0, fu1, fv0, fv1, f_inner, max_segs)
    # kill collapsed template triangles EXACTLY, in parameter space: two
    # corners sharing a snapped (u,v) make the triangle zero-area, but
    # its float det after the clip transform is only ~0 — an A,A,B sliver
    # can land det ~ +1e-3 in pixel units and rasterize garbage at the
    # near plane. Snapped params are bitwise comparable (same where()
    # branches), so this test is exact where the det test is not.
    tuv = uv01[:, tri_idx]                                   # [P, T, 3, 2]
    collapsed = ((tuv[:, :, 0] == tuv[:, :, 1]).all(-1)
                 | (tuv[:, :, 1] == tuv[:, :, 2]).all(-1)
                 | (tuv[:, :, 0] == tuv[:, :, 2]).all(-1))   # [P, T]
    pos = eval_patches(patch_corners, uv01)                  # [P, V, 3]
    nrm = eval_patches(patch_normals, uv01)
    uv = eval_patches(patch_uvs, uv01)
    if heightmap is not None and disp_scale != 0.0:
        # geometric normal of the DISPLACED surface via two param-space
        # finite differences (the DS recomputes normals from the
        # heightmap gradient, Tessellation.hlsl DomainShader)
        def surf(uvp):
            pp = eval_patches(patch_corners, uvp)
            nn = eval_patches(patch_normals, uvp)
            tt = eval_patches(patch_uvs, uvp)
            return displace(pp, nn, tt, heightmap, disp_scale)

        eps = 0.25 / max_segs
        pos = surf(uv01)
        # one-sided differences that flip to backward at the far edges
        # (so the probe never degenerates); the hemisphere match against
        # the control normal fixes the orientation either way
        du = jnp.where(uv01[..., 0:1] + eps <= 1.0, eps, -eps)
        dv = jnp.where(uv01[..., 1:2] + eps <= 1.0, eps, -eps)
        zero = jnp.zeros_like(du)
        pu = surf(uv01 + jnp.concatenate([du, zero], axis=-1))
        pv = surf(uv01 + jnp.concatenate([zero, dv], axis=-1))
        g = jnp.cross(pu - pos, pv - pos)
        flip = jnp.sign((g * nrm).sum(-1, keepdims=True))
        g = g * jnp.where(flip == 0.0, 1.0, flip)
        nrm = g / jnp.maximum(
            jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    # tangent = d(bilinear)/du (the DS's tangent reconstruction)
    v01 = uv01[..., 1:2]
    tan = ((patch_corners[:, None, 1] - patch_corners[:, None, 0])
           * (1 - v01)
           + (patch_corners[:, None, 3] - patch_corners[:, None, 2]) * v01)
    tan = tan / jnp.maximum(
        jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-9)

    t = tri_idx.shape[0]
    flat_idx = (jnp.arange(p)[:, None, None] * pos.shape[1]
                + tri_idx[None, :, :]).reshape(-1)           # [P*T*3]
    corner_pos = pos.reshape(-1, 3)[flat_idx]
    corner_nrm = nrm.reshape(-1, 3)[flat_idx]
    corner_tan = tan.reshape(-1, 3)[flat_idx]
    corner_uv = uv.reshape(-1, 2)[flat_idx]
    tri_item = jnp.repeat(patch_item, t)
    tri_live = jnp.repeat(live, t) & ~collapsed.reshape(-1)

    # pad to the raster group size (static): padding triangles are
    # zero-area (all corners at 0) and masked dead
    n_t = p * t
    n_pad = (-n_t) % pad_to
    if n_pad:
        def padr(a):
            widths = ((0, n_pad * (3 if a.shape[0] == 3 * n_t else 1)),) \
                + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, widths)
        corner_pos = padr(corner_pos)
        corner_nrm = padr(corner_nrm)
        corner_tan = padr(corner_tan)
        corner_uv = padr(corner_uv)
        tri_item = padr(tri_item)
        tri_live = jnp.pad(tri_live, (0, n_pad), constant_values=False)
    return corner_pos, corner_nrm, corner_tan, corner_uv, tri_item, tri_live
