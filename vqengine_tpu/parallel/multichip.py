"""Multi-chip rendering — the scaling story the single-GPU reference lacks
(SURVEY.md §2.7: its 'parallelism' is CPU threads + D3D12 queues; here the
device mesh replaces both).

Sharding model (SPMD via shard_map over a jax.sharding.Mesh):
- axis "sp" (screen/space parallel): the framebuffer splits into horizontal
  bands, one per device; geometry is replicated, each device bins + rasters
  + shades only its band. This is the renderer analog of tensor/sequence
  parallelism — the big spatial dimension is sharded.
- axis "dp" (data parallel): independent frames/views (stereo eyes,
  animation batches) shard across the other mesh dimension.

Cross-band communication (all on ICI via XLA collectives):
- SSAO taps can reach past a band edge: a ppermute halo exchange brings
  `halo` neighbor rows of the half-res depth/normal slabs in before the
  taps run (frame borders edge-clamp, matching the single-chip clamp).
- SSR rays traverse the whole frame vertically: the quarter-res trace
  inputs (color/depth/normals) all_gather to each device, the hi-Z march
  runs for the full frame, and each device keeps its own band of the
  result (quarter-res traffic is ~1.5 MB/frame at 1080p).
- Shadow maps / IBL tables / textures are replicated inputs (their
  per-pixel tests are pointwise given the band's world positions).

Feature parity with graph.render_forward: shadows (ESM, cached maps),
adaptive SSAO (quality presets + bilateral upsample), SSR + DNSR
(spatial prefilter AND the temporal history resolve — history is
band-sharded, all_gathered for the reprojection), IBL (SH9 diffuse +
specular pyramid + BRDF LUT), textured materials incl. adaptive aniso,
MSAA 4x with the per-sample edge resolve (1-row halo for seam-exact
edge detection), motion vectors, alpha-mask peel, depth-peeled
transparents, skydome, tonemap.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import culling, ibl, raster, shading
from ..ops import texture as tex_ops2
from ..ops import postprocess as pp
from ..ops import colorspace as cs
from ..ops import ssao as ssao_ops
from ..ops import ssr as ssr_ops
from ..render import graph


def make_mesh(devices: Sequence[jax.Device] | None = None,
              dp: int = 1, sp: int | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if sp is None:
        sp = len(devices) // dp
    assert dp * sp == len(devices), f"mesh {dp}x{sp} != {len(devices)} devices"
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def _halo_exchange(x: jnp.ndarray, pad: int, axis_name: str = "sp"):
    """Pad a band slab [H, W, ...] with `pad` rows from the neighboring
    bands via ppermute; frame borders replicate the edge row (the same
    clamp the single-chip taps apply). Returns [H + 2*pad, W, ...]."""
    n = jax.lax.axis_size(axis_name)
    if pad <= 0 or n == 1:
        return jnp.concatenate(
            [jnp.broadcast_to(x[:1], (pad,) + x.shape[1:]), x,
             jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0) \
            if pad > 0 else x
    idx = jax.lax.axis_index(axis_name)
    from_prev = jax.lax.ppermute(x[-pad:], axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
    from_next = jax.lax.ppermute(x[:pad], axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
    edge_top = jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])
    edge_bot = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
    top = jnp.where((idx == 0), edge_top, from_prev)
    bot = jnp.where((idx == n - 1), edge_bot, from_next)
    return jnp.concatenate([top, x, bot], axis=0)


def _render_band(scene: graph.DeviceScene, consts: graph.FrameConstants,
                 width: int, height: int, band_height: int, n_bands: int,
                 env: graph.EnvironmentMaps | None = None,
                 shadow_maps: dict | None = None,
                 textures=None,
                 slots_used: tuple | None = None,
                 msaa: bool = False,
                 enable_ssao: bool = False,
                 enable_ssr: bool = False,
                 ssao_halo: int = 16,
                 aniso_taps: int = 0,
                 msaa_edge_resolve: "bool | str" = True,
                 enable_motion_vectors: bool = False,
                 ssr_history: jnp.ndarray | None = None,
                 scene_transparent: graph.DeviceScene | None = None,
                 enable_alpha_mask: bool = False,
                 ssao_quality: str = "medium",
                 dynamic_item_ids: tuple | None = None):
    """Render this device's horizontal band of one frame. Runs inside
    shard_map; band index comes from the 'sp' mesh axis. Mirrors
    graph.render_forward stage by stage (see module docstring for the
    collectives that stitch band-crossing effects).

    ssr_history: this band's half-res history slab [bh/2, W/2, 7]; the
    reprojection gather can land in any band, so it all_gathers to the
    full frame first (quarter of the frame's pixels x 16 B on ICI).
    Returns (ldr, depth, new_history) — new_history stays band-sharded."""
    band = jax.lax.axis_index("sp")
    y0 = band * band_height

    visible, lod = culling.cull_and_select_lod(
        consts.world, scene.aabb_center, scene.aabb_extent,
        consts.frustum_planes, consts.view_proj, scene.item_num_lods)
    tri_mask = culling.triangle_mask_from_items(
        scene.tri_item, scene.tri_lod, visible, lod)

    # the same gather-free corner/G-buffer pipeline as geometry_pass,
    # restricted to this band via the homogeneous y-shift (exact)
    wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
    tl = scene.num_tris_live
    tri_item = scene.tri_item[:tl]
    clip_c = raster.transform_clip_corners(
        scene.corner_positions, tri_item, wvp)
    corner_n, corner_t, corner_u = (scene.corner_normals,
                                    scene.corner_tangents,
                                    scene.corner_uvs)
    tri_mask_c = tri_mask[:tl]
    # quad + tri patch amplification (identical on every band: factors
    # are camera-derived, so the sharded frame is seam-consistent)
    clip_c, corner_n, corner_t, corner_u, tri_item, tri_mask_c = \
        graph.append_amplified_patches(scene, consts, visible, wvp,
                                       clip_c, corner_n, corner_t,
                                       corner_u, tri_item, tri_mask_c)
    setup = raster.setup_triangles(clip_c, None, width, band_height,
                                   tri_mask=tri_mask_c,
                                   full_height=height, y_offset=y0)
    extra = raster.pack_gbuf_extra_corners(
        corner_n, corner_t, corner_u,
        tri_item, consts.normal_mats,
        scene.item_material[tri_item], scene.item_object[tri_item])
    binned = raster.bin_triangles(setup, width, band_height, extra=extra)
    coverage = records = None
    if msaa:
        depth, tri_id, gbuf, coverage = raster.rasterize_gbuf(
            binned, width, band_height, msaa=True)      # cov [4, bh, W]
        if msaa_edge_resolve:
            records = raster.pack_records(setup, extra)
    else:
        depth, tri_id, gbuf = raster.rasterize_gbuf(binned, width,
                                                    band_height)
    mask = tri_id != raster.BG_ID
    wpos = graph.world_pos_from_depth(depth, consts, width, band_height,
                                      full_height=height, y_offset=y0)

    from ..ops import palette
    mrow = palette.palette_lookup(gbuf[8].astype(jnp.int32), scene.materials)
    ids = jnp.moveaxis(gbuf[9:11], 0, -1)
    wn = jnp.moveaxis(gbuf[0:3], 0, -1)
    wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-9)
    wt = jnp.moveaxis(gbuf[3:6], 0, -1)
    uv = jnp.moveaxis(gbuf[6:8], 0, -1)
    wpos = jnp.where(mask[..., None], wpos, 0.0)

    lod = None
    if textures is not None:
        # screen-space uv gradients wrap at band edges (jnp.roll): compute
        # the texture LOD on a 1-row halo-exchanged uv slab so seam rows
        # see the neighbor band's uv like the single-chip gradients do
        from ..ops import texture as tex_ops
        uv_t_p = _halo_exchange(uv, 1) * 1.0
        mrow_p = _halo_exchange(mrow[..., 8:12], 1)
        uv_scaled = uv_t_p * mrow_p[..., 0:2] + mrow_p[..., 2:4]
        lod = tex_ops.uv_mip_level(
            uv_scaled, tex_ops.tex_base_size(textures),
            tex_ops.tex_num_levels(textures) - 1)[1:-1]
    # R2 mip jitter at GLOBAL frame rows: band dithers match single-chip
    mip_jit = (tex_ops2.mip_jitter(band_height, width, y_offset=y0)
               if textures is not None else None)
    mat = graph.material_pass(scene, tri_id, uv=uv, wnrm=wn, wtan=wt,
                              textures=textures, mrow=mrow, ids=ids,
                              slots_used=slots_used, lod=lod,
                              aniso_taps=aniso_taps,
                              mip_jitter=mip_jit)
    n = mat["normal"] if mat.get("normal") is not None else wn

    if enable_alpha_mask and textures is not None and "alpha" in mat:
        depth, tri_id, mask, wpos, n, mat, coverage = \
            graph._alpha_mask_peel(
                scene, consts, binned, width, band_height, depth, tri_id,
                mask, wpos, n, mat, coverage, textures, aniso_taps,
                slots_used, mip_jit, full_height=height, y_offset=y0)

    ao_map = None
    ao = jnp.broadcast_to(consts.ambient_factor, mask.shape)
    ao = ao * mat["local_ao"]
    if enable_ssao:
        # halo exchange on the half-res slabs so taps near band edges see
        # the neighbor band's geometry (single-chip taps see the frame);
        # the same CACAO-style quality presets as render_forward (the
        # adaptive refinement compacts band-locally)
        dh = graph.pool2(depth)
        nh = graph.pool2(n)
        pad = ssao_halo
        dh_p = _halo_exchange(dh, pad)
        nh_p = _halo_exchange(nh, pad)
        info = {"near": consts.proj_params[0], "far": consts.proj_params[1],
                "fov_y": consts.proj_params[2], "view": consts.view_matrix}
        if ssao_quality in ("lowest", "low"):
            # quarter-res generation with the preset tap budget — the
            # same routing as render_forward's two bottom presets
            # (single-chip parity; r4 ADVICE: 'low' was silently running
            # half-res/12-tap here)
            taps = ssao_ops.PRESETS[ssao_quality][0]
            qpad = pad // 2
            ao_q = ssao_ops.ssao(graph.pool2(dh_p), graph.pool2(nh_p),
                                 info, y_offset=y0 // 4 - qpad,
                                 full_height=height // 4, num_taps=taps)
            ao_q = ao_q[qpad:qpad + dh.shape[0] // 2]
            ao_half = ssao_ops.upsample_bilateral(ao_q, graph.pool2(dh),
                                                  dh)
        else:
            taps, extra_t, deint = ssao_ops.PRESETS.get(
                ssao_quality, ssao_ops.PRESETS["medium"])
            ao_half = ssao_ops.ssao(dh_p, nh_p, info,
                                    y_offset=y0 // 2 - pad,
                                    full_height=height // 2,
                                    num_taps=taps, adaptive_taps=extra_t,
                                    deinterleave=deint)
            ao_half = ao_half[pad:pad + dh.shape[0]]
        ao_map = ssao_ops.upsample_bilateral(ao_half, dh, depth)[
            :band_height, :width]
        ao = ao * ao_map

    spot_vis = point_vis = dir_vis = None
    if shadow_maps is not None:
        spot_vis, point_vis, dir_vis = graph.shadow_pass(
            scene, consts, wpos, n, shadow_maps=shadow_maps)

    env_illum = None
    if env is not None:
        v = consts.camera_pos - wpos
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        env_illum = ibl.environment_illumination(
            n, v, mat["roughness"], mat["metalness"], mat["albedo"],
            env.diffuse_cube, list(env.specular_mips), env.brdf_lut,
            hdri_yaw=consts.hdri_yaw, sh_irradiance=env.sh_irradiance,
                brdf_poly=env.brdf_poly)

    enable_shadows = shadow_maps is not None
    hdr = shading.shade_forward(
        world_pos=wpos, normal=n,
        albedo=mat["albedo"], roughness=mat["roughness"],
        metalness=mat["metalness"], emissive=mat["emissive"],
        ao=ao,
        camera_pos=consts.camera_pos,
        point_lights=consts.point_lights, spot_lights=consts.spot_lights,
        spot_extra=consts.spot_extra, directional=consts.directional,
        point_casters=consts.point_casters if enable_shadows else None,
        point_shadow=point_vis,
        spot_casters=consts.spot_casters if enable_shadows else None,
        spot_caster_extra=(consts.spot_caster_extra
                           if enable_shadows else None),
        spot_shadow=spot_vis,
        dir_shadow=dir_vis,
        env_illumination=env_illum)

    if env is not None:
        # quarter-res sky + phase upsample, exactly like render_forward's
        # sky_background; the y-blend at band seams takes its +-1 quarter
        # rows from the neighbor bands via halo exchange
        dirs_q = graph._sky_quarter_dirs(consts, width, height,
                                         y_offset=y0, out_rows=band_height)
        sky_q = ibl.sky_radiance(dirs_q, env.equirect, consts.hdri_yaw,
                                 bilinear=True)
        sky_qp = _halo_exchange(sky_q, 1)
        up_y = graph._axis_up4(sky_qp[1:-1], 0, band_height,
                               prev=sky_qp[:-2], nxt=sky_qp[2:])
        background = graph._axis_up4(up_y, 1, width)
    else:
        background = jnp.broadcast_to(consts.clear_color, hdr.shape)
    if coverage is not None:
        covm = coverage.mean(axis=0) if coverage.ndim == 3 else coverage
        if msaa_edge_resolve and coverage.ndim == 3 and records is not None:
            # per-sample edge resolve with a 1-row halo so edge detection
            # and neighbor candidates at band seams see the adjacent band
            # (the single-chip pass sees the whole frame)
            object_id = ids[..., 0].astype(jnp.int32)
            halo = (_halo_exchange(tri_id, 1), _halo_exchange(depth, 1),
                    _halo_exchange(object_id, 1), _halo_exchange(mask, 1))
            attrs_e = {"ids": ids, "records": records, "wpos": wpos}
            if msaa_edge_resolve == "shade":
                w_sec, sec_rgb = graph._msaa_edge_secondary(
                    scene, consts, env, textures, attrs_e, tri_id, depth,
                    mask, coverage, ao_map, mip_jit, spot_vis, point_vis,
                    dir_vis, width, band_height, aniso_taps, slots_used,
                    enable_shadows, halo=halo, full_height=height,
                    y_offset=y0)
            else:
                # neighbor mode: the secondary color can live in the
                # adjacent band's seam row — exchange 1 row of shaded hdr
                w_sec, sec_rgb = graph._msaa_edge_neighbor(
                    attrs_e, tri_id, depth, mask, coverage, hdr,
                    width, band_height, halo=halo,
                    hdr_halo=_halo_exchange(hdr, 1))
            w_pri = jnp.maximum(covm - w_sec, 0.0)
            hdr = (hdr * w_pri[..., None] + sec_rgb
                   + background * (1.0 - covm)[..., None])
        else:
            hdr = (hdr * covm[..., None]
                   + background * (1 - covm[..., None]))
        hdr = jnp.where((mask | (covm > 0))[..., None], hdr, background)
    else:
        hdr = jnp.where(mask[..., None], hdr, background)

    motion = None
    if enable_motion_vectors:
        # post-peel per-pixel item ids from the material pass: correct for
        # tessellation-amplified triangles (whose tri ids index past
        # tri_item) and avoids re-paying the per-pixel tri_item gather —
        # mirrors render_forward
        motion = graph.motion_vectors(scene, consts, wpos, tri_id, mask,
                                      item_id=mat["item_id"].astype(
                                          jnp.int32),
                                      dynamic_item_ids=dynamic_item_ids)

    new_hist = None
    if enable_ssr:
        # all_gather the quarter-res trace inputs; march the full frame's
        # rays, keep this band's slice, spatially prefilter band-local
        hdr_q = graph.pool2(graph.pool2(hdr))
        d_q = graph.pool2(graph.pool2(depth))
        n_q = graph.pool2(graph.pool2(n))
        hdr_qf = jax.lax.all_gather(hdr_q, "sp", axis=0, tiled=True)
        d_qf = jax.lax.all_gather(d_q, "sp", axis=0, tiled=True)
        n_qf = jax.lax.all_gather(n_q, "sp", axis=0, tiled=True)
        refl_f, conf_f = ssr_ops.trace_reflections(
            hdr_qf, d_qf, n_qf, consts.view_matrix, consts.proj_params)
        qbh = d_q.shape[0]
        refl_q = jax.lax.dynamic_slice_in_dim(refl_f, band * qbh, qbh, 0)
        conf_q = jax.lax.dynamic_slice_in_dim(conf_f, band * qbh, qbh, 0)
        hh, hw = graph.pool2(depth).shape[:2]
        refl_h = jnp.repeat(jnp.repeat(refl_q, 2, 0), 2, 1)[:hh, :hw]
        conf_h = jnp.repeat(jnp.repeat(conf_q, 2, 0), 2, 1)[:hh, :hw]
        hist_full = None
        if ssr_history is not None:
            # the reprojection gather can land in any band: all_gather
            # the half-res history (16 B x quarter of the frame on ICI)
            hist_full = jax.lax.all_gather(ssr_history, "sp", axis=0,
                                           tiled=True)
        refl_dn_h, new_hist = ssr_ops.denoise_reflections(
            refl_h, conf_h, graph.pool2(mat["roughness"]),
            history=hist_full,
            motion=None if motion is None else graph.pool2(motion),
            depth=graph.pool2(depth),
            y_offset=y0 // 2, full_height=height // 2)
        refl_dn = jnp.repeat(jnp.repeat(refl_dn_h, 2, 0), 2, 1)[
            :band_height, :width]
        conf_u = jnp.repeat(jnp.repeat(conf_h, 2, 0), 2, 1)[
            :band_height, :width]
        v = consts.camera_pos - wpos
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        hdr_refl = ssr_ops.apply_reflections(
            hdr, refl_dn, conf_u, mat["roughness"], mat["metalness"],
            mat["albedo"], n, v)
        hdr = jnp.where(mask[..., None], hdr_refl, hdr)

    if (scene_transparent is not None
            and scene_transparent.num_tris_live > 0):
        hdr = graph.transparent_pass(
            scene_transparent, consts, hdr, depth, width, band_height,
            env=env, textures=textures, slots_used=slots_used,
            full_height=height, y_offset=y0)

    ldr = pp.tonemap(hdr, cs.DISPLAY_CURVE_SRGB)
    return ldr, depth, new_hist


def render_forward_sharded(mesh: Mesh, scene: graph.DeviceScene,
                           consts_batch: graph.FrameConstants,
                           width: int, height: int,
                           env: graph.EnvironmentMaps | None = None,
                           shadow_maps: dict | None = None,
                           textures=None,
                           slots_used: tuple | None = None,
                           msaa: bool = False,
                           enable_ssao: bool = False,
                           enable_ssr: bool = False,
                           ssao_halo: int = 16,
                           aniso_taps: int = 0,
                           msaa_edge_resolve: "bool | str" = True,
                           enable_motion_vectors: bool = False,
                           ssr_history: jnp.ndarray | None = None,
                           scene_transparent: graph.DeviceScene | None = None,
                           enable_alpha_mask: bool = False,
                           ssao_quality: str = "medium",
                           dynamic_item_ids: tuple | None = None):
    """Render a dp-batch of frames, each sharded into sp screen bands.

    consts_batch: FrameConstants with a leading [dp] batch dim on every
    field (independent views/frames). env / shadow_maps / textures /
    scene_transparent are replicated device-resident resources.
    ssr_history [dp, H//2, W//2, 7] enables the DNSR temporal resolve
    (band-sharded along rows; pass zeros for the first frame).
    Returns ldr [dp, H, W, 3], depth [dp, H, W], and — when ssr_history
    is given — new_history [dp, H//2, W//2, 4] to carry to the next frame.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert height % sp == 0, f"height {height} not divisible by sp={sp}"
    assert (height // sp) % 4 == 0, \
        f"band height {height // sp} must be a multiple of 4 (sky grid)"
    band_height = height // sp
    carry_hist = enable_ssr and ssr_history is not None

    kwargs = dict(slots_used=slots_used, msaa=msaa,
                  enable_ssao=enable_ssao, enable_ssr=enable_ssr,
                  ssao_halo=ssao_halo, aniso_taps=aniso_taps,
                  msaa_edge_resolve=msaa_edge_resolve,
                  enable_motion_vectors=enable_motion_vectors,
                  enable_alpha_mask=enable_alpha_mask,
                  ssao_quality=ssao_quality,
                  dynamic_item_ids=dynamic_item_ids)

    def shard_fn(scene, consts, env, shadow_maps, textures, scene_t, hist):
        kw = dict(kwargs)
        kw.update(env=env, shadow_maps=shadow_maps, textures=textures,
                  scene_transparent=scene_t)

        def per_frame(consts, hist_i):
            return _render_band(scene, consts, width, height,
                                band_height, sp, ssr_history=hist_i, **kw)
        if carry_hist:
            ldr, depth, new_hist = jax.vmap(per_frame)(consts, hist)
            return ldr, depth, new_hist
        ldr, depth, _ = jax.vmap(lambda c: per_frame(c, None))(consts)
        return ldr, depth

    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
    specs_consts = jax.tree_util.tree_map(lambda _: P("dp"), consts_batch)
    hist_spec = jax.tree_util.tree_map(
        lambda _: P("dp", "sp", None, None), ssr_history) \
        if carry_hist else jax.tree_util.tree_map(lambda _: P(), ssr_history)
    out_specs = (P("dp", "sp", None, None), P("dp", "sp", None))
    if carry_hist:
        out_specs = out_specs + (P("dp", "sp", None, None),)
    # jit the whole sharded step: an un-jitted shard_map dispatches
    # EAGERLY op by op (measured 9.5 min vs 54 s for the driver dryrun
    # shapes on the 1-core CPU host — each primitive compiled separately)
    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep(scene), specs_consts, rep(env), rep(shadow_maps),
                  rep(textures), rep(scene_transparent), hist_spec),
        out_specs=out_specs,
        check_vma=False,  # pallas_call outputs carry no vma info
    ))
    return fn(scene, consts_batch, env, shadow_maps, textures,
              scene_transparent, ssr_history)


def stack_frame_constants(consts_list):
    """Stack per-frame FrameConstants into a dp-batched pytree."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *consts_list)
