"""Device-side frustum culling + LOD selection — counterpart of the
reference's multi-threaded CPU cull (Culling.cpp:322-422:
FFrustumCullWorkerContext::Process AABB-vs-frustum loop,
CalculateProjectedBoundingBoxArea :153-173, GetLODFromProjectedScreenArea
:408-422). The per-BB worker loops become one vectorized pass over [N] item
tensors; the visible list becomes a mask (static shapes for jit).
"""
from __future__ import annotations

import jax.numpy as jnp


def world_aabbs(world: jnp.ndarray, centers: jnp.ndarray,
                extents: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform local AABBs by per-item world matrices [N,4,4] ->
    (world centers [N,3], world extents [N,3])."""
    c = jnp.einsum("nij,nj->ni", world[:, :3, :3], centers) + world[:, :3, 3]
    e = jnp.einsum("nij,nj->ni", jnp.abs(world[:, :3, :3]), extents)
    return c, e


def frustum_cull(world_centers: jnp.ndarray, world_extents: jnp.ndarray,
                 planes: jnp.ndarray) -> jnp.ndarray:
    """AABB vs frustum planes [6,4] (ax+by+cz+d >= 0 inside) ->
    visible mask [N]. The conservative box test used by the reference
    (Culling.h:43-45 intersection predicates)."""
    d = jnp.einsum("nk,pk->np", world_centers, planes[:, :3]) + planes[None, :, 3]
    r = jnp.einsum("nk,pk->np", world_extents, jnp.abs(planes[:, :3]))
    return (d + r >= 0.0).all(axis=1)


def projected_bb_area(world_centers: jnp.ndarray, world_extents: jnp.ndarray,
                      view_proj: jnp.ndarray) -> jnp.ndarray:
    """NDC-space bbox area of the 8 projected AABB corners
    (CalculateProjectedBoundingBoxArea, Culling.cpp:153-173):
    area = (maxx-minx)*(maxy-miny) in NDC [-1,1] -> [0,4]."""
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=jnp.float32)                                       # [8,3]
    corners = world_centers[:, None, :] + signs[None] * world_extents[:, None, :]
    ones = jnp.ones_like(corners[..., :1])
    hom = jnp.concatenate([corners, ones], axis=-1)              # [N,8,4]
    clip = jnp.einsum("ij,nkj->nki", view_proj, hom)
    w = jnp.where(jnp.abs(clip[..., 3]) > 1e-9, clip[..., 3], 1e-9)
    ndc = clip[..., :2] / w[..., None]
    lo = ndc.min(axis=1)
    hi = ndc.max(axis=1)
    ext = hi - lo
    return ext[..., 0] * ext[..., 1]


def lod_from_projected_area(area: jnp.ndarray, num_lods: jnp.ndarray,
                            max_lods: int = 8) -> jnp.ndarray:
    """GetLODFromProjectedScreenArea (Culling.cpp:408-422): LOD k while
    area <= 0.1 * 10^-k, clamped to the mesh's LOD count."""
    area = jnp.maximum(area, 1e-30)
    # smallest k with area > 0.1*10^-k  ==  ceil(-log10(area) - 1), >= 0
    k = jnp.ceil(-jnp.log10(area) - 1.0).astype(jnp.int32)
    k = jnp.clip(k, 0, max_lods - 1)
    return jnp.minimum(k, num_lods - 1)


def tessellation_morph_factor(lod: jnp.ndarray, area: jnp.ndarray,
                              num_lods: jnp.ndarray,
                              window: float = 0.4) -> jnp.ndarray:
    """Continuous per-item geomorph factor [N] in [0,1] (1 = full fine
    detail) — the reference's distance-based tess factors
    (Tessellation.hlsl CalcTessFactor) mapped onto the projected-area LOD
    metric: with g = -log10(area) - 1 the continuous LOD, level k is
    active for g in (k-1, k], and over the last `window` of that range the
    level morphs toward its coarser parents so that at g = k it equals
    level k+1 exactly (grid_exact_halving) and the switch is invisible.
    The coarsest level has no parent and never morphs."""
    g = -jnp.log10(jnp.maximum(area, 1e-30)) - 1.0
    m = jnp.clip((lod.astype(jnp.float32) - g) / window, 0.0, 1.0)
    return jnp.where(lod >= num_lods - 1, 1.0, m)


def cull_and_select_lod(world: jnp.ndarray, centers: jnp.ndarray,
                        extents: jnp.ndarray, planes: jnp.ndarray,
                        view_proj: jnp.ndarray, num_lods: jnp.ndarray,
                        force_lod0: bool = False):
    """-> (visible [N] bool, lod [N] int32). One fused device pass replacing
    Scene::GatherFrustumCullParameters + CullFrustums (Scene.cpp:1070-1308)."""
    wc, we = world_aabbs(world, centers, extents)
    visible = frustum_cull(wc, we, planes)
    if force_lod0:
        lod = jnp.zeros(world.shape[0], dtype=jnp.int32)
    else:
        area = projected_bb_area(wc, we, view_proj)
        lod = lod_from_projected_area(area, num_lods)
    return visible, lod


def triangle_mask_from_items(tri_item: jnp.ndarray, tri_lod: jnp.ndarray,
                             visible: jnp.ndarray, lod: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle active mask: its item is visible and the triangle
    belongs to the item's selected LOD level.

    The [N]-table fetch per triangle runs as a palette one-hot matmul:
    the two scalar gathers (visible[tri_item], lod[tri_item]) are
    latency-bound at ~8 ms per 284k triangles; one MXU lookup of a
    [N, 2] table is ~0.3 ms."""
    from .palette import palette_lookup
    table = jnp.stack([visible.astype(jnp.float32),
                       lod.astype(jnp.float32)], axis=1)      # [N, 2]
    rows = palette_lookup(tri_item, table)                    # [T, 2]
    return (rows[:, 0] > 0.5) & (tri_lod == rows[:, 1].astype(jnp.int32))