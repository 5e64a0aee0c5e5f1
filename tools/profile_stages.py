"""Stage-level TPU profile of the bench frame (honest scan timing).

Times cumulative feature configs of render_forward plus isolated
geometry sub-stages on the exact bench scene; differences between rows
give per-stage costs. Run alone — one TPU client at a time (a second
axon client steals the chip grant and the first dies silently).
"""
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

    from vqengine_tpu.ops import raster
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, textures = build_sponza_stress()
    scene = graph.upload_scene(buffers)
    env = graph.build_environment(procedural_sky_equirect(512, 256))
    slots_used = graph.slots_used_of(buffers.materials)

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
    shadow_maps = jax.jit(graph.render_shadow_maps)(scene, cam_list[0])

    def checksum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
                   if hasattr(x, "astype"))

    def timed(name, frame_fn, carry_hist=False):
        if carry_hist:
            # BENCH-matching row: ssr_history threads through the scan so
            # the DNSR temporal resolve AND the motion-vector path are live
            # (ADVICE r3: without the carry, XLA DCE'd both).
            from vqengine_tpu.ops import ssr as ssr_ops
            hist0 = ssr_ops.init_history(height // 2, width // 2)

            @jax.jit
            def run_n(consts_batch):
                def step(carry, consts_i):
                    acc, hist = carry
                    c, hist = frame_fn(consts_i, hist)
                    return (acc + c, hist), None
                (tot, _), _ = jax.lax.scan(
                    step, (jnp.float32(0.0), hist0), consts_batch)
                return tot
        else:
            @jax.jit
            def run_n(consts_batch):
                def step(carry, consts_i):
                    return carry + frame_fn(consts_i), None
                tot, _ = jax.lax.scan(step, jnp.float32(0.0), consts_batch)
                return tot

        @jax.jit
        def nop(t):
            return t + 1

        tot = run_n(consts_batch)
        _ = np.asarray(tot)
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(consts_batch))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:28s} {ms:8.2f} ms/frame", flush=True)
        return ms

    from vqengine_tpu.ops import culling, palette

    def setup_only(consts):
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        tl = scene.num_tris_live
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, scene.tri_item[:tl], wvp)
        return raster.setup_triangles(clip_c, None, width, height,
                                      tri_mask=tri_mask[:tl])

    def stage_setup(consts):
        return checksum(setup_only(consts))

    def stage_bin(consts):
        setup = setup_only(consts)
        tl = scene.num_tris_live
        tri_item = scene.tri_item[:tl]
        extra = raster.pack_gbuf_extra_corners(
            scene.corner_normals, scene.corner_tangents, scene.corner_uvs,
            tri_item, consts.normal_mats,
            scene.item_material[tri_item], scene.item_object[tri_item])
        binned = raster.bin_triangles(setup, width, height, extra=extra)
        return checksum(binned)

    def stage_geom(consts):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        return checksum((depth, tri_id))

    def fwd(consts, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env, **kw)
        return checksum((out["ldr"], out["depth"]))

    def stage_clip(consts):
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        tl = scene.num_tris_live
        return checksum(raster.transform_clip_corners(
            scene.corner_positions, scene.tri_item[:tl], wvp))

    timed("clip corners only", stage_clip)
    timed("setup(cull+clip+edges)", stage_setup)
    timed("+binning(sort+records)", stage_bin)
    timed("geometry(=bin+raster_gbuf)", stage_geom)
    timed("fwd minimal(no sh/ao/ssr)", lambda c: fwd(
        c, enable_shadows=False, enable_ssao=False, enable_ssr=False))
    timed("fwd +shadows", lambda c: fwd(
        c, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=False, enable_ssr=False))
    timed("fwd +shadows+ssao", lambda c: fwd(
        c, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=True, enable_ssr=False))
    timed("fwd full(+ssr)", lambda c: fwd(
        c, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=True, enable_ssr=True))
    timed("fwd full+msaa(no edge)", lambda c: fwd(
        c, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=True, enable_ssr=True, msaa=True,
        msaa_edge_resolve=False))
    timed("fwd full+msaa", lambda c: fwd(
        c, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=True, enable_ssr=True, msaa=True))
    timed("fwd full+msaa+tex2", lambda c: fwd(
        c, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=True, enable_ssr=True, msaa=True,
        textures=textures, aniso_taps=2, slots_used=slots_used))
    def fwd_hist(consts, hist, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            ssr_history=hist, **kw)
        return checksum((out["ldr"], out["depth"])), out["ssr_history"]

    timed("fwd BENCH(tex aniso8+mv+hist)", lambda c, h: fwd_hist(
        c, h, enable_shadows=True, shadow_maps=shadow_maps,
        enable_ssao=True, enable_ssr=True, msaa=True,
        textures=textures, aniso_taps=8, slots_used=slots_used,
        enable_motion_vectors=True), carry_hist=True)


if __name__ == "__main__":
    main()
