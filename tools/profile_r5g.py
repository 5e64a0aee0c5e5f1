"""Round-5g: decompose the bench's t_geo block (64.2 ms at the 210.4
record — geometry + untextured material + shade + IBL + sky + tonemap)
into cumulative rows, on the REAL bench scene:

  setup      cull + corner transform + patch amplify + triangle setup
  bin        + tile binning (the radix pipeline)
  raster     + the Pallas G-buffer kernel (msaa off)
  raster4x   geometry_pass with msaa=True (the bench kernel config)
  mat        + palette material pass (untextured)
  shade      + 16-light forward PBR + IBL
  t_geo      full render_forward row (adds sky + tonemap) == bench t_geo

Deltas between cumulative rows attribute the block. NOTE checksums force
materialization of each row's outputs, so a delta can read slightly below
its true fused cost; trends across rows are what matter.

Run ALONE on the TPU (one axon client; no CPU-heavy work concurrently).
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

    from vqengine_tpu.ops import culling, raster, shading, ibl as ibl_ops
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, textures = build_sponza_stress()
    scene = graph.upload_scene(buffers)
    env = graph.build_environment(procedural_sky_equirect(512, 256))

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

    def timed(name, frame_fn):
        @jax.jit
        def run_n(consts_batch):
            def step(carry, consts_i):
                return carry + frame_fn(consts_i), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), consts_batch)
            return tot

        @jax.jit
        def nop(t):
            return t + 1

        _ = np.asarray(run_n(consts_batch))
        floors = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(nop(jnp.zeros(4)))
            floors.append(time.perf_counter() - t0)
        floor = float(np.median(floors))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run_n(consts_batch))
            best = min(best, time.perf_counter() - t0)
        ms = (best - floor) / n * 1e3
        print(f"{name:34s} {ms:8.2f} ms/frame", flush=True)
        return ms

    tl = int(scene.num_tris_live)

    def front_end(consts):
        """cull + transform + amplify + setup (geometry_pass's front)."""
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        tri_item = scene.tri_item[:tl]
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)
        cn, ct, cu = (scene.corner_normals, scene.corner_tangents,
                      scene.corner_uvs)
        tri_mask_c = tri_mask[:tl]
        clip_c, cn, ct, cu, tri_item, tri_mask_c = \
            graph.append_amplified_patches(scene, consts, visible, wvp,
                                           clip_c, cn, ct, cu, tri_item,
                                           tri_mask_c)
        setup = raster.setup_triangles(clip_c, None, width, height,
                                       tri_mask=tri_mask_c)
        extra = raster.pack_gbuf_extra_corners(
            cn, ct, cu, tri_item, consts.normal_mats,
            scene.item_material[tri_item], scene.item_object[tri_item])
        return setup, extra

    def f_setup(consts):
        setup, extra = front_end(consts)
        return (setup.edges9.sum() + setup.tile_lo.sum().astype(jnp.float32)
                + extra.sum())

    def f_bin(consts):
        setup, extra = front_end(consts)
        binned = raster.bin_triangles(setup, width, height, extra=extra)
        return (binned.pairs.sum() + binned.starts.sum().astype(jnp.float32)
                + binned.rstarts.sum().astype(jnp.float32))

    def f_raster(consts, msaa=False):
        depth, tri_id, attrs, mask, cov = graph.geometry_pass(
            scene, consts, width, height, msaa=msaa)
        s = (depth.sum() + tri_id.sum().astype(jnp.float32)
             + attrs["uv"].sum() + attrs["wnrm"].sum())
        if cov is not None:
            s = s + cov.sum()
        return s

    def f_mat(consts):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        wn = attrs["wnrm"]
        wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True),
                              1e-9)
        mat = graph.material_pass(scene, tri_id, uv=attrs["uv"], wnrm=wn,
                                  wtan=attrs["wtan"], textures=None,
                                  mrow=attrs.get("mrow"),
                                  ids=attrs.get("ids"))
        return mat["albedo"].sum() + mat["roughness"].sum() + depth.sum()

    def f_shade(consts):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        wn = attrs["wnrm"]
        wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True),
                              1e-9)
        mat = graph.material_pass(scene, tri_id, uv=attrs["uv"], wnrm=wn,
                                  wtan=attrs["wtan"], textures=None,
                                  mrow=attrs.get("mrow"),
                                  ids=attrs.get("ids"))
        nn = mat["normal"] if mat.get("normal") is not None else wn
        v = consts.camera_pos - attrs["wpos"]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
        env_illum = ibl_ops.environment_illumination(
            nn, v, mat["roughness"], mat["metalness"], mat["albedo"],
            env.diffuse_cube, list(env.specular_mips), env.brdf_lut,
            hdri_yaw=consts.hdri_yaw, sh_irradiance=env.sh_irradiance,
            brdf_poly=env.brdf_poly)
        ao = jnp.broadcast_to(consts.ambient_factor, mask.shape) \
            * mat["local_ao"]
        hdr = shading.shade_forward(
            world_pos=attrs["wpos"], normal=nn, albedo=mat["albedo"],
            roughness=mat["roughness"], metalness=mat["metalness"],
            emissive=mat["emissive"], ao=ao, camera_pos=consts.camera_pos,
            point_lights=consts.point_lights, spot_lights=consts.spot_lights,
            spot_extra=consts.spot_extra, directional=consts.directional,
            env_illumination=env_illum)
        return hdr.sum() + depth.sum()

    def f_tgeo(consts):
        out = graph.render_forward(scene, consts, width=width, height=height,
                                   env=env, enable_shadows=False,
                                   enable_ssao=False, enable_ssr=False)
        return out["ldr"].sum() + out["depth"].sum()

    which = set(sys.argv[1:]) or {"all"}
    rows = []
    if which & {"all", "front"}:
        rows.append(("setup", timed("setup (cull+xform+setup)", f_setup)))
        rows.append(("bin", timed("+ binning", f_bin)))
    if which & {"all", "raster"}:
        rows.append(("raster", timed("+ raster kernel", f_raster)))
        rows.append(("raster4x", timed("geometry msaa=4x",
                                       lambda c: f_raster(c, msaa=True))))
    if which & {"all", "shade"}:
        rows.append(("mat", timed("+ material (palette)", f_mat)))
        rows.append(("shade", timed("+ shade + IBL", f_shade)))
        rows.append(("t_geo", timed("t_geo (render_forward row)", f_tgeo)))
    print({k: round(v, 2) for k, v in rows}, flush=True)


if __name__ == "__main__":
    main()
