"""Multi-chip rendering — the scaling story the single-GPU reference lacks
(SURVEY.md §2.7: its 'parallelism' is CPU threads + D3D12 queues; here the
device mesh replaces both).

Sharding model (SPMD via shard_map over a jax.sharding.Mesh):
- axis "sp" (screen/space parallel): the framebuffer splits into horizontal
  bands, one per device; geometry is replicated, each device bins + rasters
  + shades only its band. This is the renderer analog of tensor/sequence
  parallelism — the big spatial dimension is sharded, no collectives needed
  until readback (an all_gather of bands which jnp handles at the output
  boundary).
- axis "dp" (data parallel): independent frames/views (e.g. cube-face
  shadow renders, stereo eyes, animation batches) shard across the other
  mesh dimension.

Collectives ride ICI automatically from the output specs; there is no NCCL
analog to port.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import culling, raster, shading
from ..ops import postprocess as pp
from ..ops import colorspace as cs
from ..render import graph


def make_mesh(devices: Sequence[jax.Device] | None = None,
              dp: int = 1, sp: int | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if sp is None:
        sp = len(devices) // dp
    assert dp * sp == len(devices), f"mesh {dp}x{sp} != {len(devices)} devices"
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def _render_band(scene: graph.DeviceScene, consts: graph.FrameConstants,
                 width: int, height: int, band_height: int, n_bands: int):
    """Render this device's horizontal band of one frame. Runs inside
    shard_map; band index comes from the 'sp' mesh axis."""
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
    setup = raster.setup_triangles(clip_c, None, width, band_height,
                                   tri_mask=tri_mask[:tl],
                                   full_height=height, y_offset=y0)
    extra = raster.pack_gbuf_extra_corners(
        scene.corner_normals, scene.corner_tangents, scene.corner_uvs,
        tri_item, consts.normal_mats,
        scene.item_material[tri_item], scene.item_object[tri_item])
    binned = raster.bin_triangles(setup, width, band_height, extra=extra)
    depth, tri_id, gbuf = raster.rasterize_gbuf(binned, width, band_height)
    mask = tri_id != raster.BG_ID
    wpos = graph.world_pos_from_depth(depth, consts, width, band_height,
                                      full_height=height, y_offset=y0)
    attrs = {"wpos": jnp.where(mask[..., None], wpos, 0.0),
             "wnrm": jnp.moveaxis(gbuf[0:3], 0, -1)}

    from ..ops import palette
    mrow = palette.palette_lookup(gbuf[8].astype(jnp.int32), scene.materials)
    ids = jnp.moveaxis(gbuf[9:11], 0, -1)
    mat = graph.material_pass(scene, tri_id, mrow=mrow, ids=ids)
    n = attrs["wnrm"]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    hdr = shading.shade_forward(
        world_pos=attrs["wpos"], normal=n,
        albedo=mat["albedo"], roughness=mat["roughness"],
        metalness=mat["metalness"], emissive=mat["emissive"],
        ao=jnp.broadcast_to(consts.ambient_factor, mask.shape),
        camera_pos=consts.camera_pos,
        point_lights=consts.point_lights, spot_lights=consts.spot_lights,
        spot_extra=consts.spot_extra, directional=consts.directional)
    hdr = jnp.where(mask[..., None], hdr, consts.clear_color)
    ldr = pp.tonemap(hdr, cs.DISPLAY_CURVE_SRGB)
    return ldr, depth


def render_forward_sharded(mesh: Mesh, scene: graph.DeviceScene,
                           consts_batch: graph.FrameConstants,
                           width: int, height: int):
    """Render a dp-batch of frames, each sharded into sp screen bands.

    consts_batch: FrameConstants with a leading [dp] batch dim on every
    field (independent views/frames). Returns ldr [dp, H, W, 3],
    depth [dp, H, W].
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert height % sp == 0, f"height {height} not divisible by sp={sp}"
    band_height = height // sp

    def per_frame(scene, consts):
        ldr, depth = _render_band(scene, consts, width, height,
                                  band_height, sp)
        return ldr, depth

    def shard_fn(scene, consts):
        # in shard_map: consts has its dp dim stripped to this device's
        # frame via P('dp'); vmap over the local singleton frame axis
        ldr, depth = jax.vmap(per_frame, in_axes=(None, 0))(scene, consts)
        return ldr, depth

    specs_scene = jax.tree_util.tree_map(lambda _: P(), scene)
    specs_consts = jax.tree_util.tree_map(lambda _: P("dp"), consts_batch)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(specs_scene, specs_consts),
        out_specs=(P("dp", "sp", None, None), P("dp", "sp", None)),
        check_vma=False,  # pallas_call outputs carry no vma info
    )
    return fn(scene, consts_batch)


def stack_frame_constants(consts_list):
    """Stack per-frame FrameConstants into a dp-batched pytree."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *consts_list)
