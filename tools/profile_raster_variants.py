"""Raster kernel design-space probe: tile height (VPU work per group
scales with NPX; pair counts grow as tiles shrink) and K_MAX (fine/medium
tier split). Times binning+raster on the bench scene at 1080p for each
variant by monkeypatching the module constants before trace. Run alone."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import build_sponza_stress  # noqa: E402


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vqengine_tpu.ops import culling, raster
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, _ = build_sponza_stress()
    scene = graph.upload_scene(buffers)

    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg, p.yaw_deg = 15.0, -90.0
    p.fov_v_deg, p.near_z, p.far_z = 60.0, 0.5, 4000.0
    cam = Camera(p, aspect=width / height)
    renderer = VQRendererTPU()

    n = 16
    cam_list = []
    for i in range(n):
        cam.yaw = -90.0 + 4.0 * np.sin(i * 0.15)
        cam_list.append(renderer.build_frame_constants(buffers, cam, lights))
    consts_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *cam_list)

    def checksum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
                   if hasattr(x, "astype"))

    @jax.jit
    def nop(t):
        return t + 1

    def timed(name, frame_fn):
        @jax.jit
        def run_n(consts_batch):
            def step(carry, consts_i):
                return carry + frame_fn(consts_i), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), consts_batch)
            return tot
        tot = run_n(consts_batch)
        _ = np.asarray(tot)
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(consts_batch))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:40s} {ms:8.2f} ms/frame", flush=True)
        return ms

    def geom(consts, k_max, msaa):
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        tl = scene.num_tris_live
        tri_item = scene.tri_item[:tl]
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)
        setup = raster.setup_triangles(clip_c, None, width, height,
                                       tri_mask=tri_mask[:tl])
        extra = raster.pack_gbuf_extra_corners(
            scene.corner_normals, scene.corner_tangents, scene.corner_uvs,
            tri_item, consts.normal_mats,
            scene.item_material[tri_item], scene.item_object[tri_item])
        binned = raster.bin_triangles(setup, width, height, k_max=k_max,
                                      extra=extra)
        out = raster.rasterize_gbuf(binned, width, height, msaa=msaa)
        return checksum((out[0], out[1]))

    def with_tile_h(th):
        raster.TILE_H = th
        raster.NPX = raster.TILE_H * raster.TILE_W
        raster._get_gbuf_kernel.cache_clear()

    for th in (16, 8):
        with_tile_h(th)
        for k_max in (16, 32):
            timed(f"tile_h={th} k_max={k_max} msaa", lambda c, k=k_max: geom(c, k, True))
    with_tile_h(16)


if __name__ == "__main__":
    main()
