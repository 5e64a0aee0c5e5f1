"""The jitted render graph — the reference's whole frame dispatch
(VQRenderer::RenderScene, SceneRendering.cpp:309-910: depth pre-pass +
forward lighting + post-process across 7 command queues with fences)
collapses into jitted JAX functions over HBM tensors; XLA's scheduler
replaces the queues/fences/multi-threaded command recording.

A "render graph" here is a pure function (DeviceScene, FrameConstants) ->
framebuffer, jit-specialized per (resolution, output curve) — the analog of
the reference's PSO permutation specialization (PipelineStateObjects.h).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops import colorspace as cs
from ..ops import culling, ibl, palette, raster, shading, shadow
from ..ops import ssao as ssao_ops
from ..ops import postprocess as pp
from ..ops import ssr as ssr_ops

# Adaptive-pass capacity fractions (frame pixels / frac), read at trace
# time — profiler ladders (tools/profile_r5*.py) re-bind them between jit
# builds to measure cap economics. Values are the measured knee of the
# cost/saturation trade on the bench scene (BASELINE.md r4/r5 ladders).
MSAA_EDGE_CAP_FRAC = 32   # per-sample edge resolve compaction
TEX_ANISO_WALK_FRAC = 32  # anisotropic ellipse-walk refinement
# neighbor-color edge resolve: match + fetch on the compacted lanes (4
# flat tri_id gathers + 1 hdr row gather at [cap]) instead of the dense
# full-frame 4-neighbor select; A/B'd in tools/profile_r5c.py
EDGE_NEIGHBOR_COMPACT = True


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvironmentMaps:
    """Device-resident IBL resources (the output of the reference's
    load-time PreFilterEnvironmentMap, EnvironmentMapRendering.cpp:139-486)."""
    equirect: jnp.ndarray                  # [He, We, 3] linear HDR
    diffuse_cube: jnp.ndarray              # [6, Sd, Sd, 3]
    specular_mips: tuple                   # tuple of [6, S_m, S_m, 3]
    brdf_lut: jnp.ndarray                  # [L, L, 2]
    sh_irradiance: jnp.ndarray = None      # [9, 3] SH9 diffuse coefficients
    brdf_poly: jnp.ndarray = None          # [D, D, 2] Chebyshev LUT fit


def build_environment(equirect_np, diffuse_size: int = 64,
                      specular_base: int = 128, specular_mips: int = 6,
                      lut_size: int = 256) -> EnvironmentMaps:
    """Load-time IBL prefilter (runs on device; MXU convolutions).

    The shading-time sample tables are stored bf16: per-pixel gathers hit
    the fast TPU path only for tables under ~1-2 MB, and prefiltered
    radiance tolerates 8-bit mantissas (samplers upcast to f32).
    sh_irradiance carries the l<=2 SH projection of the irradiance so
    shading's diffuse term is gather-free (ibl.sh9_irradiance_coeffs)."""
    eq = jnp.asarray(equirect_np)
    return EnvironmentMaps(
        equirect=eq.astype(jnp.bfloat16),
        diffuse_cube=ibl.diffuse_irradiance_cube(
            eq, size=diffuse_size).astype(jnp.bfloat16),
        specular_mips=tuple(
            m.astype(jnp.bfloat16) for m in ibl.specular_prefilter_mips(
                eq, base_size=specular_base, num_mips=specular_mips)),
        brdf_lut=jnp.asarray(ibl.brdf_lut_cached(lut_size)),
        sh_irradiance=ibl.sh9_irradiance_coeffs(eq),
        brdf_poly=jnp.asarray(ibl.brdf_poly_fit(
            ibl.brdf_lut_cached(lut_size))),
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceScene:
    positions: jnp.ndarray
    normals: jnp.ndarray
    tangents: jnp.ndarray
    uvs: jnp.ndarray
    item_of_vertex: jnp.ndarray
    indices: jnp.ndarray
    tri_item: jnp.ndarray
    tri_lod: jnp.ndarray
    materials: jnp.ndarray
    item_material: jnp.ndarray
    item_object: jnp.ndarray
    item_num_lods: jnp.ndarray
    aabb_center: jnp.ndarray
    aabb_extent: jnp.ndarray
    # static per-corner tables, positions[indices] etc. flattened to
    # [3*Tlive, .]: the index buffer is static, so gathering per frame was
    # pure waste (~45 ms at 283k tris on TPU); Tlive is the unpadded live
    # triangle count rounded to the raster group size, so binning work
    # (sort, scatter, record gather) skips the power-of-two bucket padding
    corner_positions: jnp.ndarray = None  # [3Tl, 3]
    corner_normals: jnp.ndarray = None    # [3Tl, 3]
    corner_tangents: jnp.ndarray = None   # [3Tl, 3]
    corner_uvs: jnp.ndarray = None        # [3Tl, 2]
    # geomorph targets (None when nothing tessellates): the on-device
    # continuous-tessellation morph table, lerped toward by a per-item
    # factor each frame (Tessellation.hlsl's distance factors)
    corner_morph_mid: jnp.ndarray = None  # [3Tl, 3]
    num_tris_live: int = field(metadata=dict(static=True), default=0)
    # quad-patch tessellation (ops/tessellation.py amplification stage):
    # control data + the static max-level template; the factor-1 geometry
    # lives at rows >= num_tris_live of indices/tri_item (shadow path)
    patch_corners: jnp.ndarray = None     # [P, 4, 3]
    patch_normals: jnp.ndarray = None     # [P, 4, 3]
    patch_uvs: jnp.ndarray = None         # [P, 4, 2]
    patch_item: jnp.ndarray = None        # [P]
    patch_heightmap: jnp.ndarray = None   # [S, S]
    patch_params: jnp.ndarray = None      # [Vt, 2] template grid
    patch_tri_idx: jnp.ndarray = None     # [Tt, 3] template triangles
    patch_disp_scale: float = field(metadata=dict(static=True), default=0.0)
    patch_tess_scale: float = field(metadata=dict(static=True),
                                    default=100.0)
    # TRI-domain material-driven tessellation (amplify_tri): control
    # triangles of items whose material enables tessellation
    tpatch_corners: jnp.ndarray = None    # [P, 3, 3]
    tpatch_normals: jnp.ndarray = None    # [P, 3, 3]
    tpatch_uvs: jnp.ndarray = None        # [P, 3, 2]
    tpatch_item: jnp.ndarray = None       # [P]
    tpatch_heightmap: jnp.ndarray = None  # [S, S]
    tpatch_bary: jnp.ndarray = None       # [Vt, 3] template barycentrics
    tpatch_tri_idx: jnp.ndarray = None    # [Tt, 3] template triangles
    tpatch_disp_scale: float = field(metadata=dict(static=True),
                                     default=0.0)
    tpatch_tess_scale: float = field(metadata=dict(static=True),
                                     default=100.0)


def _bucket(n: int, minimum: int = 256) -> int:
    """Next power-of-two bucket >= n, so differently sized scenes share
    compiled graphs (the analog of the reference's PSO cache hit rate —
    compile once per bucket, not per scene)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def upload_scene(buffers, bucketize: bool = True) -> DeviceScene:
    import numpy as np

    v = buffers.positions.shape[0]
    t = buffers.indices.shape[0]
    # main-view triangle count: patch items' factor-1 base triangles sit
    # at the end of the tri arrays and render only in the shadow path
    # (the amplifier emits their tessellated replacements per frame)
    t_main = t if buffers.num_tris_main is None else buffers.num_tris_main
    n = max(1, len(buffers.items))
    # live-count rounded to the raster group size (corner-table length;
    # triangle-indexed buffers are padded to at least this)
    tl = raster.cdiv(max(t_main, 1), raster.GROUP) * raster.GROUP
    vp = _bucket(max(v, 1)) if bucketize else v
    tp = _bucket(max(t, 1)) if bucketize else max(t, tl)

    def padv(a, rows):
        if a.shape[0] == rows:
            return a
        pad = np.zeros((rows - a.shape[0],) + a.shape[1:], dtype=a.dtype)
        return np.concatenate([a, pad], axis=0)

    idx_l = padv(buffers.indices[:t_main], tl).reshape(-1)  # [3Tl]
    pos_l = padv(buffers.positions, max(v, 1))
    nrm_l = padv(buffers.normals, max(v, 1))
    tan_l = padv(buffers.tangents, max(v, 1))
    uv_l = padv(buffers.uvs, max(v, 1))

    # padded triangles index vertex 0 three times -> zero area -> the
    # rasterizer's setup kills them (det <= 0); no masks needed.
    morph = getattr(buffers, "morph_mid", None)
    patch_kw = {}
    if getattr(buffers, "patch_corners", None) is not None:
        from ..ops import tessellation as tess
        params, tri_idx = tess.build_patch_template()
        patch_kw = dict(
            patch_corners=jnp.asarray(buffers.patch_corners),
            patch_normals=jnp.asarray(buffers.patch_normals),
            patch_uvs=jnp.asarray(buffers.patch_uvs),
            patch_item=jnp.asarray(buffers.patch_item),
            patch_heightmap=(jnp.asarray(buffers.patch_heightmap)
                             if buffers.patch_heightmap is not None
                             else None),
            patch_params=jnp.asarray(params),
            patch_tri_idx=jnp.asarray(tri_idx),
            patch_disp_scale=float(buffers.patch_disp_scale),
            patch_tess_scale=float(buffers.patch_tess_scale),
        )
    if getattr(buffers, "tpatch_corners", None) is not None:
        from ..ops import tessellation as tess
        bary, tri_idx_t = tess.build_tri_template()
        patch_kw.update(
            tpatch_corners=jnp.asarray(buffers.tpatch_corners),
            tpatch_normals=jnp.asarray(buffers.tpatch_normals),
            tpatch_uvs=jnp.asarray(buffers.tpatch_uvs),
            tpatch_item=jnp.asarray(buffers.tpatch_item),
            tpatch_heightmap=(jnp.asarray(buffers.tpatch_heightmap)
                              if buffers.tpatch_heightmap is not None
                              else None),
            tpatch_bary=jnp.asarray(bary),
            tpatch_tri_idx=jnp.asarray(tri_idx_t),
            tpatch_disp_scale=float(buffers.tpatch_disp_scale),
            tpatch_tess_scale=float(buffers.tpatch_tess_scale),
        )
    return DeviceScene(
        **patch_kw,
        corner_positions=jnp.asarray(pos_l[idx_l]),
        corner_morph_mid=(jnp.asarray(padv(morph, max(v, 1))[idx_l])
                          if morph is not None else None),
        corner_normals=jnp.asarray(nrm_l[idx_l]),
        corner_tangents=jnp.asarray(tan_l[idx_l]),
        corner_uvs=jnp.asarray(uv_l[idx_l]),
        num_tris_live=tl,
        positions=jnp.asarray(padv(buffers.positions, vp)),
        normals=jnp.asarray(padv(buffers.normals, vp)),
        tangents=jnp.asarray(padv(buffers.tangents, vp)),
        uvs=jnp.asarray(padv(buffers.uvs, vp)),
        item_of_vertex=jnp.asarray(padv(buffers.item_of_vertex, vp)),
        indices=jnp.asarray(padv(buffers.indices, tp)),
        tri_item=jnp.asarray(padv(buffers.tri_item, tp)),
        tri_lod=jnp.asarray(padv(buffers.tri_lod, tp)),
        materials=jnp.asarray(buffers.materials),
        item_material=jnp.asarray(buffers.item_material),
        item_object=jnp.asarray(buffers.item_object),
        item_num_lods=jnp.asarray(buffers.item_num_lods
                                  if buffers.item_num_lods is not None
                                  else np.ones(n, np.int32)),
        aabb_center=jnp.asarray(buffers.aabb_center
                                if buffers.aabb_center is not None
                                else np.zeros((n, 3), np.float32)),
        aabb_extent=jnp.asarray(buffers.aabb_extent
                                if buffers.aabb_extent is not None
                                else np.ones((n, 3), np.float32)),
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrameConstants:
    """Per-frame data (the PerFrame/PerView constant buffers,
    SceneRendering.cpp:429-467)."""
    world: jnp.ndarray          # [N, 4, 4]
    normal_mats: jnp.ndarray    # [N, 3, 3]
    view_proj: jnp.ndarray      # [4, 4]
    camera_pos: jnp.ndarray     # [3]
    point_lights: jnp.ndarray   # [P, 12]
    spot_lights: jnp.ndarray    # [S, 12]
    spot_extra: jnp.ndarray     # [S, 4]
    directional: jnp.ndarray    # [12]
    ambient_factor: jnp.ndarray  # scalar (SceneViews.h:61 default 0.055)
    clear_color: jnp.ndarray    # [3]
    frustum_planes: jnp.ndarray  # [6, 4] main-view planes for culling
    inv_view_proj: jnp.ndarray  # [4, 4] for sky-ray reconstruction
    hdri_yaw: jnp.ndarray       # scalar, fHDRIOffsetInRadians
    view_matrix: jnp.ndarray    # [4, 4] (SSAO view-space reconstruction)
    proj_params: jnp.ndarray    # [4]: near, far, fov_y, aspect
    # previous-frame matrices for motion vectors (Transform.h:99 prev pos;
    # ForwardLighting.hlsl PS_OUTPUT_MOTION_VECTORS)
    prev_world: jnp.ndarray     # [N, 4, 4]
    prev_view_proj: jnp.ndarray  # [4, 4]
    # shadow casters (budgets: 5 spot + 5 point + 1 dir,
    # LightingConstantBufferData.h:42-44); zero-length = feature off
    spot_casters: jnp.ndarray      # [SC, 12]
    spot_caster_extra: jnp.ndarray  # [SC, 4]
    spot_caster_vps: jnp.ndarray   # [SC, 4, 4]
    point_casters: jnp.ndarray     # [PC, 12]
    point_caster_vps: jnp.ndarray  # [PC, 6, 4, 4]
    point_caster_range: jnp.ndarray  # [PC] (near, far packed) -> [PC, 2]
    dir_vp: jnp.ndarray            # [4, 4]


def pool2(x: jnp.ndarray, reduce: str = "mean") -> jnp.ndarray:
    """2x2 downsample of [H, W, ...] via reshape + reduce. Strided slicing
    (x[::2, ::2]) relayouts the lane dimension on TPU (~11 ms for a 1080p
    depth+normal pair); reshape + a size-2 minor-axis reduce is free."""
    h = x.shape[0] // 2 * 2
    w = x.shape[1] // 2 * 2
    x4 = x[:h, :w].reshape((h // 2, 2, w // 2, 2) + x.shape[2:])
    if reduce == "min":
        return x4.min(axis=(1, 3))
    return x4.mean(axis=(1, 3))


def up2_fit(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """2x nearest upsample of [Hq, Wq, ...] fitted to exactly (h, w):
    odd targets (e.g. a 45-row half-res slab from a 90-row frame) get an
    edge-replicated last row/column instead of a silent short slice that
    breaks downstream broadcasting."""
    y = jnp.repeat(jnp.repeat(x, 2, 0), 2, 1)[:h, :w]
    ph, pw = h - y.shape[0], w - y.shape[1]
    if ph > 0 or pw > 0:
        y = jnp.pad(y, ((0, ph), (0, pw)) + ((0, 0),) * (y.ndim - 2),
                    mode="edge")
    return y


def world_pos_from_depth(depth: jnp.ndarray, consts: FrameConstants,
                         width: int, height: int,
                         full_height: int | None = None,
                         y_offset: jnp.ndarray | int = 0) -> jnp.ndarray:
    """Reconstruct world position from the depth buffer (projective
    unproject via inv_view_proj) — replaces interpolating world positions,
    which would cost 9 gathered columns per pixel. For screen-band
    sharding, full_height/y_offset locate this band's rows in the frame."""
    if full_height is None:
        full_height = height
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = 1.0 - (y_offset + jnp.arange(height, dtype=jnp.float32) + 0.5) \
        / full_height * 2.0
    ndc_x = jnp.broadcast_to(px[None, :], (height, width))
    ndc_y = jnp.broadcast_to(py[:, None], (height, width))
    clip = jnp.stack([ndc_x, ndc_y, depth, jnp.ones_like(depth)], axis=-1)
    wp = jnp.einsum("ij,hwj->hwi", consts.inv_view_proj, clip)
    w = jnp.where(jnp.abs(wp[..., 3:4]) > 1e-12, wp[..., 3:4], 1e-12)
    return wp[..., :3] / w


def _attrs_from_gbuf(scene: DeviceScene, consts: FrameConstants,
                     depth: jnp.ndarray, tri_id: jnp.ndarray,
                     gbuf: jnp.ndarray, width: int, height: int,
                     full_height: int | None = None,
                     y_offset: "jnp.ndarray | int" = 0):
    """Unpack the raster kernel's G-buffer channels into the attribute dict
    shading consumes (shared by the main pass, the alpha-mask peel, and the
    transparent layers)."""
    mask = tri_id != raster.BG_ID
    wpos = world_pos_from_depth(depth, consts, width, height,
                                full_height=full_height, y_offset=y_offset)
    return {
        "wpos": jnp.where(mask[..., None], wpos, 0.0),
        "wnrm": jnp.moveaxis(gbuf[0:3], 0, -1),
        "wtan": jnp.moveaxis(gbuf[3:6], 0, -1),
        "uv": jnp.moveaxis(gbuf[6:8], 0, -1),
        "mrow": palette.palette_lookup(
            gbuf[8].astype(jnp.int32), scene.materials),
        "ids": jnp.moveaxis(gbuf[9:11], 0, -1),
    }, mask


def append_amplified_patches(scene: DeviceScene, consts: FrameConstants,
                             visible, wvp, clip_c, corner_n, corner_t,
                             corner_u, tri_item, tri_mask_c):
    """Amplify the scene's QUAD patch sets (mesh-level, Terrain) and TRI
    patch sets (material-driven, Material.tessellation_enabled) through
    their static fractional-odd templates (ops/tessellation.py) and
    append the per-frame corner tables to the static ones. Shared by the
    single-chip geometry pass and the multichip band renderer (factors
    are camera-derived, so bands stay seam-consistent)."""
    from ..ops import tessellation as tess

    produced = []
    if scene.patch_corners is not None:
        produced.append(tess.amplify(
            scene.patch_corners, scene.patch_normals, scene.patch_uvs,
            scene.patch_item, consts.world, consts.camera_pos,
            consts.frustum_planes, scene.patch_params,
            scene.patch_tri_idx, scene.patch_tess_scale,
            heightmap=scene.patch_heightmap,
            disp_scale=scene.patch_disp_scale))
    if scene.tpatch_corners is not None:
        produced.append(tess.amplify_tri(
            scene.tpatch_corners, scene.tpatch_normals, scene.tpatch_uvs,
            scene.tpatch_item, consts.world, consts.camera_pos,
            consts.frustum_planes, scene.tpatch_bary,
            scene.tpatch_tri_idx, scene.tpatch_tess_scale,
            heightmap=scene.tpatch_heightmap,
            disp_scale=scene.tpatch_disp_scale))
    for cp, cn, ct, cu, ti_p, live_p in produced:
        live_p = live_p & visible[ti_p]
        clip_p = raster.transform_clip_corners(cp, ti_p, wvp)
        clip_c = jnp.concatenate([clip_c, clip_p], axis=0)
        corner_n = jnp.concatenate([corner_n, cn], axis=0)
        corner_t = jnp.concatenate([corner_t, ct], axis=0)
        corner_u = jnp.concatenate([corner_u, cu], axis=0)
        tri_item = jnp.concatenate([tri_item, ti_p], axis=0)
        tri_mask_c = jnp.concatenate([tri_mask_c, live_p], axis=0)
    return clip_c, corner_n, corner_t, corner_u, tri_item, tri_mask_c


def geometry_setup_gbuf(scene: DeviceScene, consts: FrameConstants,
                        width: int, height: int):
    """The raster front end: cull + LOD + corner transform + patch
    amplification + triangle setup + packed G-buffer attributes. Shared
    by geometry_pass and probe_pair_demand (which needs the setup's tile
    spans without compiling the raster kernel)."""
    visible, lod = culling.cull_and_select_lod(
        consts.world, scene.aabb_center, scene.aabb_extent,
        consts.frustum_planes, consts.view_proj, scene.item_num_lods)
    tri_mask = culling.triangle_mask_from_items(
        scene.tri_item, scene.tri_lod, visible, lod)
    wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
    # gather-free geometry front end: static corner tables sized to
    # the live (unpadded) triangle count
    tl = scene.num_tris_live
    tri_item = scene.tri_item[:tl]
    if scene.corner_morph_mid is not None:
        # on-device continuous tessellation: lerp vertices toward
        # their geomorph targets by the per-item distance factor
        # (XLA CSEs the duplicate area/AABB math with culling's)
        wc, we = culling.world_aabbs(
            consts.world, scene.aabb_center, scene.aabb_extent)
        area = culling.projected_bb_area(wc, we, consts.view_proj)
        morph_w = culling.tessellation_morph_factor(
            lod, area, scene.item_num_lods)
        clip_c = raster.transform_clip_corners_morph(
            scene.corner_positions, scene.corner_morph_mid, tri_item,
            wvp, morph_w)
    else:
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)
    corner_n, corner_t, corner_u = (scene.corner_normals,
                                    scene.corner_tangents,
                                    scene.corner_uvs)
    tri_mask_c = tri_mask[:tl]
    clip_c, corner_n, corner_t, corner_u, tri_item, tri_mask_c = \
        append_amplified_patches(scene, consts, visible, wvp, clip_c,
                                 corner_n, corner_t, corner_u,
                                 tri_item, tri_mask_c)
    setup = raster.setup_triangles(clip_c, None, width, height,
                                   tri_mask=tri_mask_c)
    extra = raster.pack_gbuf_extra_corners(
        corner_n, corner_t, corner_u,
        tri_item, consts.normal_mats,
        scene.item_material[tri_item], scene.item_object[tri_item])
    return setup, extra


def probe_pair_demand(scene: DeviceScene, consts: FrameConstants,
                      width: int, height: int) -> jnp.ndarray:
    """Measured binning pair demand for one frame — feeds
    raster.pair_cap_bucket. Compiles only the geometry front end (no
    raster kernel), so a per-scene probe jit is cheap."""
    setup, _ = geometry_setup_gbuf(scene, consts, width, height)
    return raster.pair_demand_of(setup)


def geometry_pass(scene: DeviceScene, consts: FrameConstants,
                  width: int, height: int, msaa: bool = False,
                  use_gbuf: bool = True, return_binned: bool = False,
                  pair_capacity: int | None = None,
                  tel: dict | None = None):
    """Vertex transform + cull/LOD + rasterize: produces the interpolated
    G-buffer (the depth-pre-pass + attribute interpolation stage; culling
    replaces Scene::CullFrustums, Scene.cpp:1272-1308).

    use_gbuf: interpolate attributes inside the raster kernel (one MXU
    selection dot per group) instead of per-pixel resolve gathers, which
    cost ~2.9 ms per gathered float column at 1080p. World position comes
    from depth reconstruction. With msaa, the kernel tests coverage at the
    D3D 4x sample positions, resolves depth/attributes on the min-depth
    covered triangle (DepthResolve.hlsl), and returns coverage for the
    silhouette blend.

    pair_capacity sizes the binning pair buffer (raster.pair_cap_bucket
    demand buckets); None = the safe T-sized default."""
    if use_gbuf:
        setup, extra = geometry_setup_gbuf(scene, consts, width, height)
        binned = raster.bin_triangles(setup, width, height, extra=extra,
                                      pair_capacity=pair_capacity)
        if tel is not None:
            # demand/cap like every adaptive compaction; > 1.0 <=> pairs
            # dropped (overflow[0] > 0) — callers regrow the bucket
            tel["raster_pairs"] = (binned.demand.astype(jnp.float32)
                                   / binned.pair_cap)
        coverage = None
        if msaa:
            depth, tri_id, gbuf, coverage = raster.rasterize_gbuf(
                binned, width, height, msaa=True)
            records = raster.pack_records(setup, extra)
        else:
            depth, tri_id, gbuf = raster.rasterize_gbuf(binned, width, height)
        attrs, mask = _attrs_from_gbuf(scene, consts, depth, tri_id, gbuf,
                                       width, height)
        # binning capacity accounting rides with the frame so production
        # callers can detect silently-dropped geometry (the debug-layer
        # discipline of Renderer.cpp:233-240; see engine.run's probe)
        attrs["overflow"] = binned.overflow
        # absolute pair demand rides with the frame so VQRendererTPU can
        # size the next compile's capacity bucket (pair_cap_bucket)
        attrs["pair_demand"] = binned.demand
        if msaa:
            # per-triangle record table for the post-kernel per-sample
            # edge resolve (XLA CSEs the duplicate packing in bin_triangles)
            attrs["records"] = records
        if return_binned:
            return depth, tri_id, attrs, mask, coverage, binned
        return depth, tri_id, attrs, mask, coverage

    # resolve-gather path (MSAA / use_gbuf=False): per-vertex tables
    visible, lod = culling.cull_and_select_lod(
        consts.world, scene.aabb_center, scene.aabb_extent,
        consts.frustum_planes, consts.view_proj, scene.item_num_lods)
    tri_mask = culling.triangle_mask_from_items(
        scene.tri_item, scene.tri_lod, visible, lod)
    wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
    n_items = consts.normal_mats.shape[0]
    nrm_v = palette.palette_lookup(
        scene.item_of_vertex, consts.normal_mats.reshape(n_items, 9)
    ).reshape(-1, 3, 3)
    wnrm = jnp.einsum("vij,vj->vi", nrm_v, scene.normals)
    wtan = jnp.einsum("vij,vj->vi", nrm_v, scene.tangents)
    clip = raster.transform_clip_instanced(scene.positions,
                                           scene.item_of_vertex, wvp)
    setup = raster.setup_triangles(clip, scene.indices, width, height,
                                   tri_mask=tri_mask)
    pos4 = jnp.concatenate(
        [scene.positions, jnp.ones_like(scene.positions[:, :1])], axis=1)
    world_v = consts.world[scene.item_of_vertex]            # [V,4,4]
    wpos = jnp.einsum("vij,vj->vi", world_v, pos4)[:, :3]

    binned = raster.bin_triangles(setup, width, height,
                                  pair_capacity=pair_capacity)
    coverage = None
    if msaa:
        depth_s, tri_id_s = raster.rasterize(binned, width, height, msaa=True)
        depth, tri_id, coverage = raster.msaa_resolve_visibility(depth_s, tri_id_s)
    else:
        depth, tri_id = raster.rasterize(binned, width, height)

    # fold the per-triangle material row + ids into the resolve table so
    # the whole G-buffer costs ONE per-pixel gather
    mrow_t = scene.materials[scene.item_material[scene.tri_item]]
    ids_t = jnp.stack([scene.item_object[scene.tri_item].astype(jnp.float32),
                       scene.tri_item.astype(jnp.float32)], axis=1)
    attrs, mask = raster.resolve_attributes(
        tri_id, setup, scene.indices,
        {"wpos": wpos, "wnrm": wnrm, "wtan": wtan, "uv": scene.uvs},
        tri_features={"mrow": mrow_t, "ids": ids_t})
    if return_binned:
        return depth, tri_id, attrs, mask, coverage, binned
    return depth, tri_id, attrs, mask, coverage


def slots_used_of(materials) -> tuple:
    """Static texture-slot usage from a packed [M, 32] materials array:
    9 per-slot flags + the combined-aux flag (col 29). The texture-config
    PSO permutation analog — unused slots cost zero at trace time."""
    import numpy as _np
    m = _np.asarray(materials)
    flags = [bool((m[:, 20 + k] >= 0).any()) for k in range(9)]
    flags.append(bool((m[:, 29] >= 0).any()))
    return tuple(flags)


def material_pass(scene: DeviceScene, tri_id: jnp.ndarray,
                  uv: jnp.ndarray | None = None,
                  wnrm: jnp.ndarray | None = None,
                  wtan: jnp.ndarray | None = None,
                  textures: tuple | None = None,
                  mrow: jnp.ndarray | None = None,
                  ids: jnp.ndarray | None = None,
                  aniso_taps: int = 0,
                  slots_used: tuple | None = None,
                  lod: "jnp.ndarray | None" = None,
                  mip_jitter: "jnp.ndarray | None" = None,
                  telemetry: dict | None = None):
    """Per-pixel material fetch + texture sampling — the PSMain material
    block (ForwardLighting.hlsl:226-277): per-slot Has*Map tests gate
    sampled values; albedo/emissive decode sRGB; ORM packs
    occlusion/roughness/metalness; normal maps perturb via TBN.

    mrow/ids come pre-gathered from the combined resolve table when
    available (one gather per pixel); else fetched here.

    slots_used: static per-scene tuple of 9 bools (no material references
    slot k -> skip its sampling entirely at trace time). The reference
    compiles a PSO permutation per texture config; here unused slots cost
    zero instead of dense gathers that has() would discard."""
    from ..ops import colorspace as cs_ops
    from ..ops import texture as tex_ops

    if mrow is None or ids is None:
        item = scene.tri_item[jnp.maximum(tri_id, 0)]       # [H,W]
        mid = scene.item_material[item]
        mrow = scene.materials[mid]                         # [H,W,32]
        object_id = scene.item_object[item]
        item_id = item
    else:
        object_id = ids[..., 0].astype(jnp.int32)
        item_id = ids[..., 1].astype(jnp.int32)
    out = {
        "albedo": mrow[..., 0:3],
        "emissive": mrow[..., 4:7] * mrow[..., 7:8],
        "roughness": mrow[..., 12],
        "metalness": mrow[..., 13],
        "local_ao": jnp.ones_like(mrow[..., 0]),
        "normal": wnrm,
        "object_id": object_id,
        "item_id": item_id,
    }
    if textures is None or uv is None:
        return out

    uv_t = uv * mrow[..., 8:10] + mrow[..., 10:12]          # uvScaleOffset
    max_lod = tex_ops.tex_num_levels(textures) - 1
    if lod is None:
        lod = tex_ops.uv_mip_level(uv_t, tex_ops.tex_base_size(textures),
                                   max_lod)

    def slot_id(bit):
        return mrow[..., 20 + bit].astype(jnp.int32)

    def has(bit):
        return slot_id(bit) >= 0

    def used(bit):
        if slots_used is None:
            return True
        return bit < len(slots_used) and bool(slots_used[bit])

    def sample(bit, lod_bias=None):
        l = lod if lod_bias is None else jnp.clip(lod + lod_bias, 0, max_lod)
        return tex_ops.sample_texture_array(textures, slot_id(bit), uv_t, l,
                                            jitter=mip_jitter)

    # pair-packed fast path: diffuse + combined-aux quads share a 32 B
    # gather row (TextureManager.combine_pair_quads), so the two dense
    # fetches below collapse into ONE — texture cost is fetch-count-bound
    # on TPU (~7-10 ms per dense sampled map at 1080p, BASELINE.md)
    pair_ok = (isinstance(textures, tex_ops.PackedTextures)
               and textures.pair_flat is not None
               and (used(0) or used(9)))
    diffuse_s = aux = None
    if pair_ok:
        pid = mrow[..., 30].astype(jnp.int32)
        if aniso_taps > 1:
            # adaptive_frac=16: the ellipse-walk cost is proportional to
            # the CAP, not the demand (r4b: frac4 +77 ms, frac8 +40,
            # frac16 +19 at 1080p); the capacity-aware threshold spends
            # the budget on the most anisotropic pixels first
            diffuse_s, aux = tex_ops.sample_texture_pair_aniso(
                textures, pid, slot_id(0), uv_t, num_taps=aniso_taps,
                jitter=mip_jitter, adaptive_frac=TEX_ANISO_WALK_FRAC,
                telemetry=telemetry)
        else:
            diffuse_s, aux = tex_ops.sample_texture_pair(
                textures, pid, uv_t, lod, jitter=mip_jitter)
    if used(0):
        if diffuse_s is None:
            if aniso_taps > 1:
                # diffuse samples anisotropically like the reference's
                # AnisoSampler on the albedo slot (grazing-angle floors);
                # other slots stay trilinear. Adaptive: the multi-tap
                # ellipse walk runs only on compacted high-anisotropy
                # pixels, so the dense cost is ~1 tap regardless of
                # aniso_taps (see the adaptive_frac note above).
                diffuse_s = tex_ops.sample_texture_array_aniso(
                    textures, slot_id(0), uv_t, num_taps=aniso_taps,
                    jitter=mip_jitter, adaptive_frac=TEX_ANISO_WALK_FRAC,
                    telemetry=telemetry)
            else:
                diffuse_s = sample(0)
        out["albedo"] = jnp.where(
            has(0)[..., None],
            cs_ops.srgb_to_linear_fast(diffuse_s[..., :3]) * mrow[..., 0:3],
            mrow[..., 0:3])
        out["alpha"] = jnp.where(has(0), diffuse_s[..., 3], mrow[..., 3])
    else:
        out["alpha"] = mrow[..., 3]
    # dedicated alpha-mask map (slot 3) overrides the diffuse alpha
    if used(3):
        out["alpha"] = jnp.where(has(3), sample(3)[..., 0], out["alpha"])

    if wnrm is not None and wtan is not None and used(1):
        nrm_s = sample(1, lod_bias=mrow[..., 16])
        n_mapped = tex_ops.unpack_normal_map(nrm_s[..., :3], wnrm, wtan)
        out["normal"] = jnp.where(has(1)[..., None], n_mapped, wnrm)

    # combined auxiliary map (normal.xy | roughness | metalness fused at
    # upload by TextureManager.combine_aux_maps): ONE sampled fetch where
    # the separate slots would cost three — texture sampling is
    # fetch-count-bound on TPU (~6 ms/map/frame at 1080p)
    if used(9):
        caux = mrow[..., 29].astype(jnp.int32)
        has_c = caux >= 0
        if aux is None:
            l_aux = jnp.clip(lod + mrow[..., 16], 0, max_lod)
            aux = tex_ops.sample_texture_array(textures, caux, uv_t, l_aux,
                                               jitter=mip_jitter)
        if wnrm is not None and wtan is not None:
            n_c = tex_ops.unpack_normal_map_xy(aux[..., 0:2], wnrm, wtan)
            out["normal"] = jnp.where(has_c[..., None], n_c, out["normal"])
        out["roughness"] = jnp.where(has_c, mrow[..., 12] * aux[..., 2],
                                     out["roughness"])
        out["metalness"] = jnp.where(has_c, mrow[..., 13] * aux[..., 3],
                                     out["metalness"])

    if used(2):
        out["local_ao"] = jnp.where(has(2), sample(2)[..., 0],
                                    out["local_ao"])
    if used(4):
        out["roughness"] = jnp.where(has(4),
                                     out["roughness"] * sample(4)[..., 0],
                                     out["roughness"])
    if used(5):
        out["metalness"] = jnp.where(has(5),
                                     out["metalness"] * sample(5)[..., 0],
                                     out["metalness"])
    if used(7):
        emis_s = sample(7)
        out["emissive"] = jnp.where(
            has(7)[..., None],
            cs_ops.srgb_to_linear_fast(emis_s[..., :3])
            * mrow[..., 4:7] * mrow[..., 7:8],
            out["emissive"])
    if used(8):
        orm = sample(8)
        out["roughness"] = jnp.where(has(8), out["roughness"] * orm[..., 1],
                                     out["roughness"])
        out["metalness"] = jnp.where(has(8), out["metalness"] * orm[..., 2],
                                     out["metalness"])
    return out


def render_shadow_maps(scene: DeviceScene, consts: FrameConstants,
                       shadow_dims: tuple[int, int, int] = (
                           shadow.SPOT_SHADOW_DIM, shadow.POINT_SHADOW_DIM,
                           shadow.DIRECTIONAL_SHADOW_DIM),
                       filter_mode: str = "esm") -> dict:
    """Render every caster's depth map (the per-light shadow passes,
    SceneRendering.cpp:1114-1263). Separated from the per-frame visibility
    tests so STATIC/STATIONARY lights over static geometry can cache their
    maps across frames (the reference's Light mobility semantics,
    Light.h:45-186)."""
    maps: dict = {}
    sc = int(consts.spot_casters.shape[0])
    pc = int(consts.point_casters.shape[0])
    has_dir = int(consts.dir_vp.shape[0]) > 0
    esm = filter_mode == "esm"

    # Casters render through ONE lax.scan body per light type — the full
    # 5+5+1 budget compiles a single binning+raster graph per type instead
    # of 36 unrolled launches (the reference records each view on its own
    # worker thread; here XLA reuses the compiled body). ESM maps blur,
    # then pool so the per-frame sample tables sit on the fast (<~1-2 MB)
    # TPU gather path: spot 1024->512, point faces 1024->256 (6-face cube
    # stays ~1.5 MB), directional 2048->1024.
    if sc:
        def spot_body(carry, vp):
            d = shadow.render_shadow_depth(
                scene.positions, scene.item_of_vertex, consts.world,
                vp, scene.indices, shadow_dims[0])
            return carry, d
        _, dm = jax.lax.scan(spot_body, 0, consts.spot_caster_vps)
        maps["spot"] = (shadow.prefilter_esm(dm, pool=1).astype(jnp.bfloat16)
                        if esm else dm)
    if pc:
        vps6 = consts.point_caster_vps.reshape(pc * 6, 4, 4)
        nf6 = jnp.repeat(consts.point_caster_range, 6, axis=0)

        def point_body(carry, x):
            vp, nfi = x
            d = shadow.render_shadow_depth(
                scene.positions, scene.item_of_vertex, consts.world,
                vp, scene.indices, shadow_dims[1])
            return carry, shadow.ndc_depth_to_radial(d, nfi[0], nfi[1])
        _, faces = jax.lax.scan(point_body, 0, (vps6, nf6))
        cubes = faces.reshape(pc, 6, shadow_dims[1], shadow_dims[1])
        maps["point"] = (shadow.prefilter_esm(cubes,
                                              pool=2).astype(jnp.bfloat16)
                         if esm else cubes)
    if has_dir:
        d = shadow.render_shadow_depth(
            scene.positions, scene.item_of_vertex, consts.world,
            consts.dir_vp[0], scene.indices, shadow_dims[2])
        maps["dir"] = (shadow.prefilter_esm(d, pool=1).astype(jnp.bfloat16)
                       if esm else d)
    return maps


def shadow_pass(scene: DeviceScene, consts: FrameConstants,
                wpos: jnp.ndarray, normal: jnp.ndarray,
                shadow_dims: tuple[int, int, int] = (
                    shadow.SPOT_SHADOW_DIM, shadow.POINT_SHADOW_DIM,
                    shadow.DIRECTIONAL_SHADOW_DIM),
                filter_mode: str = "esm",
                shadow_maps: dict | None = None):
    """Evaluate per-caster shadow visibility over the main view (the
    reference's in-shader shadow tests). Maps come from `shadow_maps`
    (cached for static lights) or are rendered in-frame via
    render_shadow_maps. Caster counts are static per scene, so the python
    loops specialize the graph (the PSO-permutation analog)."""
    sc = int(consts.spot_casters.shape[0])
    pc = int(consts.point_casters.shape[0])
    has_dir = int(consts.dir_vp.shape[0]) > 0  # static per scene

    if shadow_maps is None:
        shadow_maps = render_shadow_maps(scene, consts, shadow_dims,
                                         filter_mode)

    # ESM visibility evaluates below full resolution: the one-tap map
    # gather dominates its cost (fetch-count-bound at ~1.4-3.5 ns each)
    # and the prefiltered ESM response is smooth. The directional caster
    # (the visually dominant shadow) tests at HALF res; spot/point casters
    # (5+5 local lights) test at QUARTER res — 4x fewer fetches across the
    # budget. PCF keeps full resolution (hard-edged taps).
    full_hw = wpos.shape[:2]
    wpos_h = normal_h = wpos_q = None
    if filter_mode == "esm":
        wpos_h = pool2(wpos)
        normal_h = pool2(normal)
        wpos_q = pool2(wpos_h)

    def up(v, times=1):
        if filter_mode != "esm":
            return v
        for _ in range(times):
            v = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1)
        v = v[..., : full_hw[0], : full_hw[1]]
        # odd frame heights (pool2 floors): edge-replicate the short rows
        # instead of returning a slab that breaks broadcasting downstream
        ph = full_hw[0] - v.shape[-2]
        pw = full_hw[1] - v.shape[-1]
        if ph > 0 or pw > 0:
            v = jnp.pad(v, ((0, 0),) * (v.ndim - 2) + ((0, ph), (0, pw)),
                        mode="edge")
        return v

    spot_vis = None
    if sc:
        if filter_mode == "esm":
            # one projection einsum + one stacked gather for all casters
            vis = shadow.shadow_test_esm_batch(
                wpos_q, consts.spot_caster_vps[:sc],
                jnp.stack([shadow_maps["spot"][i] for i in range(sc)]),
                consts.spot_casters[:, 11])
        else:
            per = []
            for i in range(sc):
                lrow = consts.spot_casters[i]
                wi = lrow[0:3] - wpos
                wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-9)
                ndotl = jnp.clip((normal * wi).sum(-1), 0.0, 1.0)
                per.append(shadow.shadow_test_pcf(
                    wpos, ndotl, consts.spot_caster_vps[i],
                    shadow_maps["spot"][i], lrow[11], slope_scaled=True))
            vis = jnp.stack(per)
        spot_vis = up(vis, times=2)

    point_vis = None
    if pc:
        if filter_mode == "esm":
            vis = shadow.omni_shadow_test_esm_batch(
                wpos_q, consts.point_casters[:, 0:3],
                jnp.stack([shadow_maps["point"][i] for i in range(pc)]),
                consts.point_casters[:, 9], consts.point_casters[:, 8])
        else:
            vis = jnp.stack([shadow.omni_shadow_test_pcf(
                wpos, consts.point_casters[i, 0:3], shadow_maps["point"][i],
                consts.point_casters[i, 9], consts.point_casters[i, 8],
                consts.camera_pos) for i in range(pc)])
        point_vis = up(vis, times=2)

    dir_vis = None
    if has_dir:
        # directional shadowing flag rides in directional[8]
        dmap = shadow_maps["dir"]
        if filter_mode == "esm":
            dir_vis = shadow.shadow_test_esm(
                wpos_h, consts.dir_vp[0], dmap, consts.directional[7])
        else:
            wi = -consts.directional[0:3]
            wi = wi / jnp.maximum(jnp.linalg.norm(wi), 1e-9)
            ndotl = jnp.clip((normal * wi).sum(-1), 0.0, 1.0)
            dir_vis = shadow.shadow_test_pcf(
                wpos, ndotl, consts.dir_vp[0], dmap,
                consts.directional[7], slope_scaled=False)
        dir_vis = up(dir_vis)
    return spot_vis, point_vis, dir_vis


def sky_directions(consts: FrameConstants, width: int, height: int) -> jnp.ndarray:
    """Per-pixel world-space view-ray directions for skydome sampling."""
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    ndc_x = jnp.broadcast_to(px[None, :], (height, width))
    ndc_y = jnp.broadcast_to(py[:, None], (height, width))
    clip = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5),
                      jnp.ones_like(ndc_x)], axis=-1)
    wp = jnp.einsum("ij,hwj->hwi", consts.inv_view_proj, clip)
    wp = wp[..., :3] / jnp.where(jnp.abs(wp[..., 3:4]) > 1e-9, wp[..., 3:4], 1e-9)
    d = wp - consts.camera_pos
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


def _sky_quarter_dirs(consts: FrameConstants, width: int, height: int,
                      y_offset: int = 0,
                      out_rows: int | None = None) -> jnp.ndarray:
    """View-ray directions on the quarter-resolution grid whose cell (qy,
    qx) centers at full-res pixel coords (4qx + 2, y_offset + 4qy + 2).
    out_rows limits the row count (a screen band of the full frame)."""
    qw, qh = -(-width // 4), -(-(out_rows if out_rows is not None
                                 else height) // 4)
    px = (4.0 * jnp.arange(qw, dtype=jnp.float32) + 2.0) / width * 2.0 - 1.0
    py = 1.0 - (y_offset + 4.0 * jnp.arange(qh, dtype=jnp.float32) + 2.0) \
        / height * 2.0
    ndc_x = jnp.broadcast_to(px[None, :], (qh, qw))
    ndc_y = jnp.broadcast_to(py[:, None], (qh, qw))
    clip = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, 0.5),
                      jnp.ones_like(ndc_x)], axis=-1)
    wp = jnp.einsum("ij,hwj->hwi", consts.inv_view_proj, clip)
    wp = wp[..., :3] / jnp.where(jnp.abs(wp[..., 3:4]) > 1e-9, wp[..., 3:4], 1e-9)
    d = wp - consts.camera_pos
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


def _axis_up4(a: jnp.ndarray, axis: int, n_out: int,
              prev: jnp.ndarray | None = None,
              nxt: jnp.ndarray | None = None) -> jnp.ndarray:
    """Bilinear 4x upsample along one axis of a quarter grid (centers at
    4i + 1.5): gather-free — +-1 shifts blended with the four static
    phase weights, interleaved by reshape. Output index y reads quarter
    coord (y + 0.5)/4 - 0.5. prev/nxt override the edge-clamped shifted
    copies (the multichip band renderer passes halo-exchanged rows so
    seams interpolate exactly like the single-chip frame)."""
    if prev is None:
        prev = jnp.concatenate([jax.lax.slice_in_dim(a, 0, 1, axis=axis),
                                jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1,
                                                     axis=axis)], axis=axis)
    if nxt is None:
        nxt = jnp.concatenate([jax.lax.slice_in_dim(a, 1, a.shape[axis],
                                                    axis=axis),
                               jax.lax.slice_in_dim(a, a.shape[axis] - 1,
                                                    a.shape[axis],
                                                    axis=axis)], axis=axis)
    # phases r = 0..3: p = i + (2r - 3)/8
    phases = [0.375 * prev + 0.625 * a,
              0.125 * prev + 0.875 * a,
              0.875 * a + 0.125 * nxt,
              0.625 * a + 0.375 * nxt]
    out = jnp.stack(phases, axis=axis + 1)
    shape = list(a.shape)
    shape[axis] = shape[axis] * 4
    out = out.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, n_out, axis=axis)


def _upsample4_phase(q: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    return _axis_up4(_axis_up4(q, 0, height), 1, width)


def sky_background(consts: FrameConstants, env: EnvironmentMaps,
                   width: int, height: int) -> jnp.ndarray:
    """Skydome radiance for the frame at QUARTER resolution, bilinearly
    upsampled: sky content is magnified many-fold from the equirect at
    1080p, so the full-res per-pixel gather (~5.6 ms) is pure waste;
    quarter-res bilinear equirect taps + the phase upsampler cost ~1.5 ms
    and come out smoother than the old full-res nearest fetch."""
    dirs_q = _sky_quarter_dirs(consts, width, height)
    sky_q = ibl.sky_radiance(dirs_q, env.equirect, consts.hdri_yaw,
                             bilinear=True)
    return _upsample4_phase(sky_q, height, width)


def transparent_pass(scene_t: DeviceScene, consts: FrameConstants,
                     hdr: jnp.ndarray, opaque_depth: jnp.ndarray,
                     width: int, height: int,
                     env: EnvironmentMaps | None = None,
                     textures: tuple | None = None,
                     num_layers: int = 2,
                     slots_used: tuple | None = None,
                     full_height: int | None = None,
                     y_offset: "jnp.ndarray | int" = 0) -> jnp.ndarray:
    """Blended transparents (the reference's Model.h:45-65 transparent mesh
    split, rendered after opaques with alpha blending): depth-peel
    `num_layers` transparent layers in front of the opaque depth, shade
    each (lights + IBL, no screen-space effects), and composite
    back-to-front with per-pixel alpha. Order-independent up to
    num_layers-deep overlap — the TPU-native answer to per-mesh
    back-to-front sorting."""
    visible, lod = culling.cull_and_select_lod(
        consts.world, scene_t.aabb_center, scene_t.aabb_extent,
        consts.frustum_planes, consts.view_proj, scene_t.item_num_lods)
    tri_mask = culling.triangle_mask_from_items(
        scene_t.tri_item, scene_t.tri_lod, visible, lod)
    wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
    tl = scene_t.num_tris_live
    tri_item = scene_t.tri_item[:tl]
    clip_c = raster.transform_clip_corners(
        scene_t.corner_positions, tri_item, wvp)
    setup = raster.setup_triangles(clip_c, None, width, height,
                                   tri_mask=tri_mask[:tl],
                                   full_height=full_height,
                                   y_offset=y_offset)
    extra = raster.pack_gbuf_extra_corners(
        scene_t.corner_normals, scene_t.corner_tangents, scene_t.corner_uvs,
        tri_item, consts.normal_mats,
        scene_t.item_material[tri_item], scene_t.item_object[tri_item])
    binned = raster.bin_triangles(setup, width, height, extra=extra)

    zlo = jnp.full_like(opaque_depth, -1.0)
    layers = []
    for _ in range(num_layers):
        d, idb, g = raster.rasterize_gbuf(binned, width, height,
                                          zbound=(zlo, opaque_depth))
        attrs, lmask = _attrs_from_gbuf(scene_t, consts, d, idb, g,
                                        width, height,
                                        full_height=full_height,
                                        y_offset=y_offset)
        wn = attrs["wnrm"]
        wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True),
                              1e-9)
        mat = material_pass(scene_t, idb, uv=attrs["uv"], wnrm=wn,
                            wtan=attrs["wtan"], textures=textures,
                            mrow=attrs["mrow"], ids=attrs["ids"],
                            slots_used=slots_used)
        n = mat["normal"] if mat.get("normal") is not None else wn
        env_illum = None
        if env is not None:
            v = consts.camera_pos - attrs["wpos"]
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                                1e-9)
            env_illum = ibl.environment_illumination(
                n, v, mat["roughness"], mat["metalness"], mat["albedo"],
                env.diffuse_cube, list(env.specular_mips), env.brdf_lut,
                hdri_yaw=consts.hdri_yaw, sh_irradiance=env.sh_irradiance,
                brdf_poly=env.brdf_poly)
        color = shading.shade_forward(
            world_pos=attrs["wpos"], normal=n,
            albedo=mat["albedo"], roughness=mat["roughness"],
            metalness=mat["metalness"], emissive=mat["emissive"],
            ao=jnp.broadcast_to(consts.ambient_factor, lmask.shape)
            * mat["local_ao"],
            camera_pos=consts.camera_pos,
            point_lights=consts.point_lights,
            spot_lights=consts.spot_lights,
            spot_extra=consts.spot_extra,
            directional=consts.directional,
            env_illumination=env_illum)
        alpha = mat.get("alpha", attrs["mrow"][..., 3])
        layers.append((color, jnp.clip(alpha, 0.0, 1.0), lmask))
        zlo = d   # the next layer starts behind this one

    # back-to-front: the deepest layer blends onto the opaque result first
    for color, alpha, lmask in reversed(layers):
        a = jnp.where(lmask, alpha, 0.0)[..., None]
        hdr = hdr * (1.0 - a) + color * a
    return hdr


def _alpha_mask_peel(scene: DeviceScene, consts: FrameConstants,
                     binned, width: int, height: int,
                     depth, tri_id, mask, wpos, n, mat, coverage,
                     textures, aniso_taps: int, slots_used,
                     mip_jit, full_height: int | None = None,
                     y_offset: "jnp.ndarray | int" = 0):
    """Alpha-mask discard (ForwardLighting.hlsl:237-240): peel past
    fragments whose sampled alpha fails the cutout test and re-resolve
    those pixels on the next surface (one peel layer; the reference
    discards per-fragment). Shared by render_forward and the multichip
    band renderer (full_height/y_offset locate a band's rows)."""
    fail = mask & (mat["alpha"] < 0.01)
    zlo = jnp.where(fail, depth, 2.0)   # empty window where passing
    d2, id2, g2 = raster.rasterize_gbuf(
        binned, width, height,
        zbound=(zlo, jnp.full_like(depth, 2.0)))
    attrs2, mask2 = _attrs_from_gbuf(scene, consts, d2, id2, g2,
                                     width, height,
                                     full_height=full_height,
                                     y_offset=y_offset)
    wn2 = attrs2["wnrm"]
    wn2 = wn2 / jnp.maximum(
        jnp.linalg.norm(wn2, axis=-1, keepdims=True), 1e-9)
    mat2 = material_pass(scene, id2, uv=attrs2["uv"], wnrm=wn2,
                         wtan=attrs2["wtan"], textures=textures,
                         mrow=attrs2["mrow"], ids=attrs2["ids"],
                         aniso_taps=aniso_taps, slots_used=slots_used,
                         mip_jitter=mip_jit)
    ok2 = mask2 & (mat2.get("alpha", jnp.ones_like(d2)) >= 0.01)

    def mrg(x1, x2):
        f = fail if x1.ndim == fail.ndim else fail[..., None]
        return jnp.where(f, x2, x1)

    depth = mrg(depth, jnp.where(ok2, d2, 1.0))
    tri_id = mrg(tri_id, jnp.where(ok2, id2, raster.BG_ID))
    mask = jnp.where(fail, ok2, mask)
    wpos = mrg(wpos, attrs2["wpos"])
    n2 = mat2["normal"] if mat2.get("normal") is not None else wn2
    n = mrg(n, n2)
    for k in ("albedo", "emissive", "roughness", "metalness",
              "local_ao", "object_id", "item_id", "alpha"):
        if k in mat and k in mat2:
            mat[k] = mrg(mat[k], mat2[k])
    if coverage is not None:
        # per-sample [4,H,W] (gbuf path) or scalar [H,W] coverage
        f = fail[None] if coverage.ndim == 3 else fail
        coverage = jnp.where(f, ok2.astype(coverage.dtype), coverage)
    return depth, tri_id, mask, wpos, n, mat, coverage


def motion_vectors(scene: DeviceScene, consts: FrameConstants,
                   wpos: jnp.ndarray, tri_id: jnp.ndarray,
                   mask: jnp.ndarray,
                   item_id: jnp.ndarray | None = None,
                   dynamic_item_ids: tuple | None = None) -> jnp.ndarray:
    """NDC-space motion = curr.xy/w - prev.xy/w at the resolved surface
    (ForwardLighting.hlsl:385-388). Previous world position approximates
    rigid motion via prev_world @ inv(world) per-item delta matrices;
    motion_rows compresses the per-pixel [4,4] gather to the two clip rows
    actually used (xy/w), 6 floats/pixel instead of 16.

    dynamic_item_ids (STATIC python tuple): the items whose transform
    changed since last frame — the host knows this exactly (the engine's
    animation registry; the reference likewise derives per-object motion
    from its transform history). STATIC geometry needs no per-pixel
    matrix at all: prev_clip = prev_view_proj @ wpos for every pixel, and
    each dynamic item overrides by a lane-select — so the common
    mostly-static frame skips the whole per-pixel palette fetch
    (measured +19.7 ms/frame at 1080p). None = conservatively treat all
    items as dynamic via the palette path.

    item_id: per-pixel item ids already produced by the G-buffer
    (attrs["ids"][..., 1]); passing it avoids re-gathering tri_item per
    pixel (~5 ms at 1080p)."""
    ones = jnp.ones_like(wpos[..., :1])
    wp4 = jnp.concatenate([wpos, ones], axis=-1)
    curr_clip = jnp.einsum("ij,hwj->hwi",
                           consts.view_proj[(0, 1, 3), :], wp4)
    if dynamic_item_ids is not None and len(dynamic_item_ids) > 16:
        # big dynamic sets: the unrolled per-item selects stop paying;
        # the palette path costs the same regardless of the set size
        dynamic_item_ids = None
    if dynamic_item_ids is not None:
        # static fast path: camera-only reprojection, then per-dynamic-
        # item overrides (each a [3,4] matvec + lane select; the dynamic
        # set is small — the reference's per-object motion economics)
        pvp_rows = consts.prev_view_proj[(0, 1, 3), :]  # [3, 4]
        prev_clip = jnp.einsum("ij,hwj->hwi", pvp_rows, wp4)
        if len(dynamic_item_ids) > 0:
            if item_id is None:
                item_id = scene.tri_item[jnp.maximum(tri_id, 0)]
            for i in dynamic_item_ids:
                delta_i = consts.prev_world[i] @ jnp.linalg.inv(
                    consts.world[i])
                rows_i = (consts.prev_view_proj @ delta_i)[(0, 1, 3), :]
                prev_i = jnp.einsum("ij,hwj->hwi", rows_i, wp4)
                prev_clip = jnp.where((item_id == i)[..., None],
                                      prev_i, prev_clip)
    else:
        delta = jnp.einsum("nij,njk->nik", consts.prev_world,
                           jnp.linalg.inv(consts.world))
        # fold prev_view_proj into the per-item delta ON THE ITEM AXIS (N
        # matmuls, free) so the per-pixel work is one gathered [3,4] row
        # block instead of a [4,4] gather + two 4x4 matvecs
        pvp_delta = jnp.einsum("ij,njk->nik", consts.prev_view_proj, delta)
        rows = pvp_delta[:, (0, 1, 3), :]               # [N, 3, 4]
        if item_id is None:
            item_id = scene.tri_item[jnp.maximum(tri_id, 0)]
        # palette one-hot MXU lookup: item tables are small, per-pixel row
        # gathers are the cost (docs/ARCHITECTURE.md gather cost model)
        dm = palette.palette_lookup(item_id, rows.reshape(-1, 12)) \
            .reshape(item_id.shape + (3, 4))            # [H,W,3,4]
        prev_clip = jnp.einsum("hwij,hwj->hwi", dm, wp4)  # [H,W,3] x,y,w
    cw = jnp.where(jnp.abs(curr_clip[..., 2:3]) > 1e-9,
                   curr_clip[..., 2:3], 1e-9)
    pw = jnp.where(jnp.abs(prev_clip[..., 2:3]) > 1e-9,
                   prev_clip[..., 2:3], 1e-9)
    motion = curr_clip[..., :2] / cw - prev_clip[..., :2] / pw
    return jnp.where(mask[..., None], motion, 0.0)


def _msaa_edge_neighbor(attrs: dict, tri_id: jnp.ndarray,
                        depth: jnp.ndarray, mask: jnp.ndarray,
                        cov_s: jnp.ndarray, hdr: jnp.ndarray,
                        width: int, height: int,
                        halo: tuple | None = None,
                        hdr_halo: "jnp.ndarray | None" = None,
                        telemetry: dict | None = None):
    """Neighbor-color MSAA edge resolve — the cheap mode of the
    per-sample resolve (ResolveMSAA, SceneRendering.cpp:2060).

    Per-sample visibility stays EXACT (resolve_secondary re-tests the 4
    D3D sample positions against the candidate records), but the
    secondary surface's color comes from the 4-neighbor pixel whose
    primary winner IS that surface — already shaded by the dense pass one
    pixel away — instead of a sparse material/IBL/shade replay. The
    approximation is sub-pixel: the reference's per-sample shading also
    evaluates the secondary surface at sample positions ~1px apart.

    Cost: compaction + record re-test + 2 cap-scatters + a dense
    4-neighbor select; the entire sparse secondary shade (the +34..47
    ms/frame item in BASELINE.md r4) is gone.

    halo/hdr_halo: 1-row-padded tri_id/depth/object_id/mask and hdr slabs
    (multichip band seams); outputs stay interior [H, W]."""
    from ..ops import msaa as msaa_ops
    from ..ops import sparse

    cap = -(-max(4096, (width * height) // MSAA_EDGE_CAP_FRAC) // 4096) * 4096
    object_id = attrs["ids"][..., 0].astype(jnp.int32)
    det = halo if halo is not None else (tri_id, depth, object_id, mask)
    pad = 1 if halo is not None else 0
    idx, live, sec_id, n_sec, _px, _py = msaa_ops.resolve_secondary(
        attrs["records"], det[0], det[1], det[2], det[3], cov_s, cap,
        pad=pad, telemetry=telemetry)
    # COMPACTED neighbor match: the secondary surface's color comes from
    # the 4-neighbor pixel whose primary winner IS that surface — matched
    # on the [cap] lanes (4 flat tri_id gathers + ONE hdr row gather)
    # instead of a dense full-frame 4-neighbor select (4 shifted passes
    # over tri_id + hdr at 2M pixels).
    tid_flat = det[0].reshape(-1)
    hdr_p = hdr if hdr_halo is None else hdr_halo
    if not EDGE_NEIGHBOR_COMPACT:
        # dense full-frame 4-neighbor select (the r5 first cut; kept for
        # the A/B ladder)
        sec_img = sparse.scatter_pixels(
            jnp.full((height, width), -1, jnp.int32), idx, sec_id, live)
        w_img = sparse.scatter_pixels(
            jnp.zeros((height, width), jnp.float32), idx, n_sec * 0.25, live)
        found = jnp.zeros((height, width), bool)
        sec_rgb = jnp.zeros((height, width, 3), hdr.dtype)
        for dy, dx in msaa_ops.NEIGHBOR_OFFSETS:
            nb_id = msaa_ops._shift(det[0], dy, dx)
            nb_hdr = msaa_ops._shift(hdr_p, dy, dx)
            if halo is not None:
                nb_id = nb_id[1:-1]
                nb_hdr = nb_hdr[1:-1]
            match = (~found) & (nb_id == sec_img)
            sec_rgb = jnp.where(match[..., None], nb_hdr, sec_rgb)
            found = found | match
        w_img = jnp.where(found, w_img, 0.0)
        return w_img, sec_rgb * w_img[..., None]
    hdr_flat = hdr_p.reshape(-1, 3)
    hp, wp = det[0].shape  # padded dims (wp == width; hp == height + 2*pad)
    px_i = idx % width
    py_i = idx // width + pad  # interior idx -> padded row
    sel = jnp.zeros(idx.shape, jnp.int32)
    found = jnp.zeros(idx.shape, bool)
    for dy, dx in msaa_ops.NEIGHBOR_OFFSETS:
        ny = jnp.clip(py_i + dy, 0, hp - 1)
        nx = jnp.clip(px_i + dx, 0, wp - 1)
        nidx = ny * wp + nx
        match = (~found) & (tid_flat[nidx] == sec_id)
        sel = jnp.where(match, nidx, sel)
        found = found | match
    sec_rgb_c = hdr_flat[sel]                           # [cap, 3] row gather
    # sec_id == own (n_sec == 0) or unfound secondaries keep the primary;
    # background never scatters (live already excludes n_sec == 0)
    w_c = jnp.where(found, n_sec * 0.25, 0.0)
    w_img = sparse.scatter_pixels(
        jnp.zeros((height, width), jnp.float32), idx, w_c, live)
    sec_w = sparse.scatter_pixels(
        jnp.zeros((height, width, 3), hdr.dtype), idx,
        sec_rgb_c * w_c[..., None], live)
    return w_img, sec_w


def _msaa_edge_secondary(scene: DeviceScene, consts: FrameConstants,
                         env, textures, attrs: dict,
                         tri_id: jnp.ndarray, depth: jnp.ndarray,
                         mask: jnp.ndarray, cov_s: jnp.ndarray,
                         ao_map, mip_jit,
                         spot_vis, point_vis, dir_vis,
                         width: int, height: int,
                         aniso_taps: int, slots_used,
                         enable_shadows: bool,
                         halo: tuple | None = None,
                         full_height: int | None = None,
                         y_offset: "jnp.ndarray | int" = 0,
                         telemetry: dict | None = None):
    """Per-sample MSAA resolve at triangle-triangle edges — the missing
    half of ResolveMSAA (DepthResolve.hlsl + SceneRendering.cpp:2060):
    pixels whose 4 samples split between two surfaces get the SECOND
    surface shaded too, at a few percent of a dense pass.

    Per-sample visibility is re-derived post-kernel from neighbor-winner
    candidate records (ops/msaa.py), the secondary surface's attributes
    interpolate from its packed record (raster.interp_record_attrs), and
    it shades through the SAME material/IBL/direct path as the primary on
    a compacted [CAP/512, 512] pixel grid (full (8,128) VPU tiles — a
    [1, CAP] layout runs sublane-starved). Screen-space terms (SSAO, shadow
    visibility) reuse the pixel's primary values — the two surfaces are
    sub-pixel apart. Returns (w_sec [H,W] secondary sample weight,
    sec_rgb [H,W,3] pre-weighted secondary color).

    halo: optional (tri_id, depth, object_id, mask) with 1 halo row
    top+bottom (the multichip band renderer) so edge detection at band
    seams matches the single-chip frame; full_height/y_offset locate the
    band's rows for the unprojection."""
    from ..ops import msaa as msaa_ops
    from ..ops import sparse

    if full_height is None:
        full_height = height
    # 1/16 of the frame, rounded to a multiple of 4096 so the compacted
    # list reshapes to [cap/512, 512] — full (8,128) VPU tiles for the
    # secondary shade (a [1, cap] layout runs sublane-starved). Block
    # compaction (8-lane blocks) holds ~half-full blocks along
    # silhouettes (measured demand 1.61x the old 1/32 element cap).
    cap = -(-max(4096, (width * height) // MSAA_EDGE_CAP_FRAC) // 4096) * 4096
    c2 = 512
    r2n = cap // c2

    def r2(v):                                  # [cap(,k)] -> [R2, 512(,k)]
        return v.reshape((r2n, c2) + v.shape[1:])

    object_id = attrs["ids"][..., 0].astype(jnp.int32)
    records = attrs["records"]
    det = halo if halo is not None else (tri_id, depth, object_id, mask)
    idx, live, sec_id, n_sec, px, py = msaa_ops.resolve_secondary(
        records, det[0], det[1], det[2], det[3], cov_s, cap,
        pad=1 if halo is not None else 0, telemetry=telemetry)
    rec = records[jnp.maximum(sec_id, 0)]
    a = raster.interp_record_attrs(rec, px, py)

    # secondary world position: unproject its depth plane at the center
    ndc_x = px / width * 2.0 - 1.0
    ndc_y = 1.0 - (py + y_offset) / full_height * 2.0
    clip = jnp.stack([ndc_x, ndc_y, a["depth"], jnp.ones_like(px)], axis=-1)
    wp = clip @ consts.inv_view_proj.T
    wpos = wp[:, :3] / jnp.where(jnp.abs(wp[:, 3:4]) > 1e-12,
                                 wp[:, 3:4], 1e-12)

    wn = a["wnrm"]
    wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-9)
    mrow = palette.palette_lookup(r2(a["mat_id"]), scene.materials)
    ids = r2(jnp.stack([a["object_id"].astype(jnp.float32),
                        a["item_id"].astype(jnp.float32)], axis=-1))
    mj = r2(sparse.gather_pixels(mip_jit, idx)) if mip_jit is not None \
        else None
    # no telemetry into this material_pass: its aniso compaction runs on
    # the already-capped edge list, which cannot saturate harder than the
    # edge compaction itself (reported as msaa_edges)
    mat = material_pass(scene, r2(sec_id), uv=r2(a["uv"]),
                        wnrm=r2(wn), wtan=r2(a["wtan"]),
                        textures=textures, mrow=mrow, ids=ids,
                        aniso_taps=aniso_taps, slots_used=slots_used,
                        mip_jitter=mj)
    n = mat["normal"] if mat.get("normal") is not None else r2(wn)

    def g(v):                                   # [H,W] -> [R2, 512]
        return r2(sparse.gather_pixels(v, idx))

    def gs(v):                                  # [C,H,W] -> [C,R2,512]
        # per-plane flat gathers: axis-1 batched gathers miss the TPU
        # fast path (see ops/msaa.resolve_secondary)
        return jnp.stack([r2(v[c].reshape(-1)[idx])
                          for c in range(v.shape[0])])

    env_illum = None
    if env is not None:
        v = consts.camera_pos - wpos
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        env_illum = ibl.environment_illumination(
            n, r2(v), mat["roughness"], mat["metalness"], mat["albedo"],
            env.diffuse_cube, list(env.specular_mips), env.brdf_lut,
            hdri_yaw=consts.hdri_yaw, sh_irradiance=env.sh_irradiance,
            brdf_poly=env.brdf_poly)

    ao = jnp.broadcast_to(consts.ambient_factor, (r2n, c2)) \
        * mat["local_ao"]
    if ao_map is not None:
        ao = ao * g(ao_map)

    hdr_c = shading.shade_forward(
        world_pos=r2(wpos), normal=n,
        albedo=mat["albedo"], roughness=mat["roughness"],
        metalness=mat["metalness"], emissive=mat["emissive"], ao=ao,
        camera_pos=consts.camera_pos,
        point_lights=consts.point_lights,
        spot_lights=consts.spot_lights,
        spot_extra=consts.spot_extra,
        directional=consts.directional,
        point_casters=consts.point_casters if enable_shadows else None,
        point_shadow=gs(point_vis) if point_vis is not None else None,
        spot_casters=consts.spot_casters if enable_shadows else None,
        spot_caster_extra=(consts.spot_caster_extra
                           if enable_shadows else None),
        spot_shadow=gs(spot_vis) if spot_vis is not None else None,
        dir_shadow=g(dir_vis) if dir_vis is not None else None,
        env_illumination=env_illum,
    )

    w = jnp.where(live, n_sec * 0.25, 0.0)                  # [cap]
    sec_rgb = hdr_c.reshape(cap, 3) * w[:, None]
    w_img = sparse.scatter_pixels(
        jnp.zeros((height, width), jnp.float32), idx, w, live)
    rgb_img = sparse.scatter_pixels(
        jnp.zeros((height, width, 3), jnp.float32), idx, sec_rgb, live)
    return w_img, rgb_img


def render_forward(scene: DeviceScene, consts: FrameConstants,
                   width: int, height: int,
                   output_display_curve: int = cs.DISPLAY_CURVE_SRGB,
                   apply_gamma: bool = True,
                   enable_shadows: bool = True,
                   shadow_dims: tuple[int, int, int] = (
                       shadow.SPOT_SHADOW_DIM, shadow.POINT_SHADOW_DIM,
                       shadow.DIRECTIONAL_SHADOW_DIM),
                   env: EnvironmentMaps | None = None,
                   enable_ssao: bool = False,
                   enable_motion_vectors: bool = False,
                   textures: tuple | None = None,
                   msaa: bool = False,
                   enable_ssr: bool = False,
                   ssr_history: jnp.ndarray | None = None,
                   out_width: int | None = None,
                   out_height: int | None = None,
                   cas_sharpness: float | None = None,
                   shadow_filter: str = "esm",
                   shadow_maps: dict | None = None,
                   enable_alpha_mask: bool = False,
                   scene_transparent: DeviceScene | None = None,
                   aniso_taps: int = 0,
                   slots_used: tuple | None = None,
                   ssao_quality: str = "medium",
                   msaa_edge_resolve: "bool | str" = True,
                   dynamic_item_ids: tuple | None = None,
                   pair_capacity: int | None = None):
    """Full forward frame: geometry -> SSAO -> shadows -> material ->
    shade -> skydome -> transparents -> tonemap. Returns a dict with
    ldr [H,W,3], depth [H,W], tri_id [H,W], object_id [H,W], and
    optionally ao / motion [H,W,2].

    enable_alpha_mask: cutout materials discard fragments with sampled
    alpha < 0.01 (ForwardLighting.hlsl:237-240) via one depth-peel pass.
    scene_transparent: blended geometry (Model.h:45-65 transparent split)
    rendered as 2 depth-peeled layers composited back-to-front."""
    alpha_test = enable_alpha_mask and textures is not None
    # adaptive-path capacity telemetry: every compaction (and the raster
    # pair buffer) reports its demand/cap fraction; riding in
    # out["saturation"] it gets the same loud-failure treatment as raster
    # bin overflow (engine.run)
    tel: dict = {}
    geo = geometry_pass(scene, consts, width, height, msaa=msaa,
                        return_binned=alpha_test,
                        pair_capacity=pair_capacity, tel=tel)
    if alpha_test:
        depth, tri_id, attrs, mask, coverage, binned = geo
    else:
        depth, tri_id, attrs, mask, coverage = geo

    wn = attrs["wnrm"]
    wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-9)
    wt = attrs["wtan"]
    # stochastic trilinear: per-pixel R2-dithered mip pick — the
    # trilinear curve in expectation at half the (fetch-count-bound) taps
    from ..ops import texture as tex_ops
    mip_jit = (tex_ops.mip_jitter(height, width)
               if textures is not None else None)
    mat = material_pass(scene, tri_id, uv=attrs["uv"], wnrm=wn, wtan=wt,
                        textures=textures,
                        mrow=attrs.get("mrow"), ids=attrs.get("ids"),
                        aniso_taps=aniso_taps, slots_used=slots_used,
                        mip_jitter=mip_jit, telemetry=tel)
    n = mat["normal"] if mat.get("normal") is not None else wn

    if alpha_test and "alpha" in mat:
        depth, tri_id, mask, wpos2, n, mat, coverage = _alpha_mask_peel(
            scene, consts, binned, width, height, depth, tri_id, mask,
            attrs["wpos"], n, mat, coverage, textures, aniso_taps,
            slots_used, mip_jit)
        attrs["wpos"] = wpos2

    ao_map = None
    if enable_ssao:
        # FFX-CACAO-class AO from the depth pre-pass outputs with the
        # CACAO-style quality presets (AmbientOcclusion.h:78-81):
        # low = quarter res / 8 taps, medium (default) = half res / 12
        # taps, high = half res / 16 taps. Taps are per-pixel gathers, so
        # resolution and tap count set the cost.
        info = {"near": consts.proj_params[0], "far": consts.proj_params[1],
                "fov_y": consts.proj_params[2], "view": consts.view_matrix}
        # presets follow CACAO's quality ladder (AmbientOcclusion.h:78-81):
        # low = quarter res / 8 taps; medium/high = half res with the
        # ADAPTIVE machinery — a lean dense base pass + importance-ranked
        # compacted refinement (ffx_cacao's importance map / adaptive
        # preset, built as compaction; see ops/ssao.py). Upsampling is
        # depth-guided bilateral, CACAO's edge-aware Apply.
        d_h, n_h = pool2(depth), pool2(n)
        if ssao_quality in ("lowest", "low"):
            # the two bottom presets generate at QUARTER res (CACAO's
            # lowest-quality half-depth path) with their preset tap budget
            taps = ssao_ops.PRESETS[ssao_quality][0]
            d_q = pool2(d_h)
            ao_map = ssao_ops.ssao(d_q, pool2(n_h), info, num_taps=taps)
            ao_map = ssao_ops.upsample_bilateral(ao_map, d_q, d_h)
        else:
            taps, extra, deint = ssao_ops.PRESETS.get(
                ssao_quality, ssao_ops.PRESETS["medium"])
            ao_map = ssao_ops.ssao(d_h, n_h, info, num_taps=taps,
                                   adaptive_taps=extra,
                                   deinterleave=deint, telemetry=tel)
        ao_map = ssao_ops.upsample_bilateral(ao_map, d_h, depth)
        ao_map = ao_map[:height, :width]

    motion = None
    if enable_motion_vectors:
        # post-peel item ids: _alpha_mask_peel merges mat2["item_id"], so
        # pixels re-resolved past a discarded cutout carry the REVEALED
        # surface's item (attrs["ids"] would keep the discarded one —
        # wrong motion where a dynamic item sits behind a static cutout)
        motion = motion_vectors(
            scene, consts, attrs["wpos"], tri_id, mask,
            item_id=mat["item_id"].astype(jnp.int32),
            dynamic_item_ids=dynamic_item_ids)

    spot_vis = point_vis = dir_vis = None
    if enable_shadows:
        spot_vis, point_vis, dir_vis = shadow_pass(
            scene, consts, attrs["wpos"], n, shadow_dims, shadow_filter,
            shadow_maps=shadow_maps)

    env_illum = None
    if env is not None:
        v = consts.camera_pos - attrs["wpos"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        env_illum = ibl.environment_illumination(
            n, v, mat["roughness"], mat["metalness"], mat["albedo"],
            env.diffuse_cube, list(env.specular_mips), env.brdf_lut,
            hdri_yaw=consts.hdri_yaw, sh_irradiance=env.sh_irradiance,
                brdf_poly=env.brdf_poly)

    ao = jnp.broadcast_to(consts.ambient_factor, mask.shape)
    ao = ao * mat["local_ao"]  # material AO map (ForwardLighting.hlsl:269)
    if ao_map is not None:
        ao = ao * ao_map  # SSAO multiplies ambient (ForwardLighting.hlsl:279-281)

    hdr = shading.shade_forward(
        world_pos=attrs["wpos"],
        normal=n,
        albedo=mat["albedo"],
        roughness=mat["roughness"],
        metalness=mat["metalness"],
        emissive=mat["emissive"],
        ao=ao,
        camera_pos=consts.camera_pos,
        point_lights=consts.point_lights,
        spot_lights=consts.spot_lights,
        spot_extra=consts.spot_extra,
        directional=consts.directional,
        point_casters=consts.point_casters if enable_shadows else None,
        point_shadow=point_vis,
        spot_casters=consts.spot_casters if enable_shadows else None,
        spot_caster_extra=consts.spot_caster_extra if enable_shadows else None,
        spot_shadow=spot_vis,
        dir_shadow=dir_vis,
        env_illumination=env_illum,
    )
    if env is not None:
        # skydome for background pixels (Skydome.hlsl behavior)
        background = sky_background(consts, env, width, height)
    else:
        background = jnp.broadcast_to(consts.clear_color, hdr.shape)
    if coverage is not None:
        # MSAA resolve (ResolveMSAA, DepthResolve.hlsl): per-sample
        # weights. covm = covered sample fraction handles silhouettes vs
        # background; the sparse edge pass splits covered samples between
        # the primary and a shaded secondary surface at triangle-triangle
        # edges (per-sample counts are exact for the 2-surface case).
        covm = coverage.mean(axis=0) if coverage.ndim == 3 else coverage
        if (msaa_edge_resolve and coverage.ndim == 3
                and "records" in attrs):
            # mode: True/"neighbor" = exact per-sample visibility +
            # neighbor-shaded secondary color (no sparse shade; default —
            # the sparse secondary shade cost +34..47 ms/frame, BASELINE
            # r4); "shade" = sparse re-shade of the secondary surface at
            # this pixel (the maximum-fidelity path, kept measurable)
            if msaa_edge_resolve == "shade":
                w_sec, sec_rgb = _msaa_edge_secondary(
                    scene, consts, env, textures, attrs, tri_id, depth,
                    mask, coverage, ao_map, mip_jit, spot_vis, point_vis,
                    dir_vis, width, height, aniso_taps, slots_used,
                    enable_shadows, telemetry=tel)
            else:
                w_sec, sec_rgb = _msaa_edge_neighbor(
                    attrs, tri_id, depth, mask, coverage, hdr,
                    width, height, telemetry=tel)
            w_pri = jnp.maximum(covm - w_sec, 0.0)
            hdr = (hdr * w_pri[..., None] + sec_rgb
                   + background * (1.0 - covm)[..., None])
        else:
            hdr = (hdr * covm[..., None]
                   + background * (1.0 - covm[..., None]))
        hdr = jnp.where((mask | (covm > 0))[..., None], hdr, background)
    else:
        hdr = jnp.where(mask[..., None], hdr, background)

    new_ssr_history = None
    if enable_ssr:
        # SSSR + DNSR + ApplyReflections (SceneRendering.cpp:2196-2362).
        # The hi-Z march runs at QUARTER resolution (each DDA iteration
        # costs ~1.3 ms at half-res on TPU — dominated by the per-ray
        # pyramid gather); DNSR's prefilter + temporal resolve run at half
        # resolution, recovering edge stability, and the composite happens
        # at full resolution with the Fresnel weight.
        # rays run DENSE at quarter res: the SSSR ClassifyTiles-style ray
        # compaction (ray_frac=2) measured as a net LOSS here — the
        # march's per-step gathers at 130k rays are already cheap, and the
        # compaction's gather/scatter overhead exceeds the march savings
        # (r5 A/B: dense 116.8 vs frac2 119.5 ms/frame; tools/
        # profile_r5ss.py). trace_reflections keeps the compacted path
        # for callers with denser ray budgets.
        refl_q, conf_q = ssr_ops.trace_reflections(
            pool2(pool2(hdr)), pool2(pool2(depth)), pool2(pool2(n)),
            consts.view_matrix, consts.proj_params,
            ray_frac=None, telemetry=tel)
        hh, hw = pool2(depth).shape[:2]
        refl_h = up2_fit(refl_q, hh, hw)
        conf_h = up2_fit(conf_q, hh, hw)
        # denoise + temporal history at half resolution: the history
        # reprojection gather from a full-res [H,W,3] table runs on the
        # slow large-table gather path; half-res history stays small
        refl_dn_h, new_ssr_history = ssr_ops.denoise_reflections(
            refl_h, conf_h, pool2(mat["roughness"]), history=ssr_history,
            motion=None if motion is None else pool2(motion),
            depth=pool2(depth))
        refl_dn = up2_fit(refl_dn_h, height, width)
        conf = up2_fit(conf_h, height, width)
        v = consts.camera_pos - attrs["wpos"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        hdr_refl = ssr_ops.apply_reflections(
            hdr, refl_dn, conf, mat["roughness"], mat["metalness"],
            mat["albedo"], n, v)
        hdr = jnp.where(mask[..., None], hdr_refl, hdr)

    if scene_transparent is not None and scene_transparent.num_tris_live > 0:
        hdr = transparent_pass(scene_transparent, consts, hdr, depth,
                               width, height, env=env, textures=textures,
                               slots_used=slots_used)
    ldr = pp.tonemap(hdr, output_display_curve, apply_gamma=apply_gamma)

    # post chain tail (SceneRendering.cpp:2507-2788): CAS, then FSR1
    # upscale when rendering below display resolution (RenderScale < 1;
    # the HDR path skips FSR like the reference)
    from ..ops import ffx
    if cas_sharpness is not None:
        ldr = ffx.cas(ldr, cas_sharpness)
    if (out_width is not None and out_height is not None
            and (out_width != width or out_height != height)
            and output_display_curve != cs.DISPLAY_CURVE_ST2084):
        ldr = ffx.fsr1(ldr, out_height, out_width)

    # the pre-tonemap scene-referred image rides along so callers can
    # re-encode to another display curve (e.g. the exit-time HDR10 dump)
    # without re-rendering the frame (SwapChain.h:76-99 color spaces)
    out = {"ldr": ldr, "hdr": hdr, "depth": depth, "tri_id": tri_id,
           "object_id": jnp.where(mask, mat["object_id"], -1)}
    if "overflow" in attrs:
        out["overflow"] = attrs["overflow"]
    if "pair_demand" in attrs:
        out["pair_demand"] = attrs["pair_demand"]
    if tel:
        # demand/cap per adaptive compaction; > 1.0 = quality degraded
        # past the cap this frame (engine.run / bench.py surface it)
        out["saturation"] = tel
    if ao_map is not None:
        out["ao"] = ao_map
    if motion is not None:
        out["motion"] = motion
    if new_ssr_history is not None:
        out["ssr_history"] = new_ssr_history
    return out
