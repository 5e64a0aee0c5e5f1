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

    pos4 = jnp.concatenate(
        [scene.positions, jnp.ones_like(scene.positions[:, :1])], axis=1)
    world_v = consts.world[scene.item_of_vertex]
    wpos = jnp.einsum("vij,vj->vi", world_v, pos4)[:, :3]
    nrm_v = consts.normal_mats[scene.item_of_vertex]
    wnrm = jnp.einsum("vij,vj->vi", nrm_v, scene.normals)

    visible, lod = culling.cull_and_select_lod(
        consts.world, scene.aabb_center, scene.aabb_extent,
        consts.frustum_planes, consts.view_proj, scene.item_num_lods)
    tri_mask = culling.triangle_mask_from_items(
        scene.tri_item, scene.tri_lod, visible, lod)

    wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
    clip = raster.transform_clip_instanced(scene.positions,
                                           scene.item_of_vertex, wvp)
    setup = raster.setup_triangles(clip, scene.indices, width, band_height,
                                   tri_mask=tri_mask,
                                   full_height=height, y_offset=y0)
    binned = raster.bin_triangles(setup, width, band_height)
    depth, tri_id = raster.rasterize(binned, width, band_height)

    attrs, mask = raster.resolve_attributes(
        tri_id, setup, scene.indices, {"wpos": wpos, "wnrm": wnrm})

    mat = graph.material_pass(scene, tri_id)
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
