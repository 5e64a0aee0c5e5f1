"""Benchmark: the Sponza stress frame at 1080p on one TPU chip with the
full north-star config-5 (BASELINE.md): MSAA 4x through the G-buffer
kernel, textured materials (quad-packed RGBA8: aniso diffuse + normal +
roughness maps), the full 5 spot + 5 point + 1 directional shadow budget
(ESM, static-light cached maps, per-frame visibility tests), half-res
SSAO, IBL (SH9 diffuse + prefiltered specular), SSR hi-Z march + DNSR
temporal, forward PBR, tonemap.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): 16.6 ms/frame @1080p on one v5e chip.
vs_baseline > 1.0 means faster than the target.

Measurement notes (this environment's axon tunnel): block_until_ready acks
early and XLA hoists loop-invariant work, so N frames run inside ONE jitted
lax.scan over varying camera constants with full-frame checksums, timed by
a single readback minus the measured readback floor.
"""
from __future__ import annotations

import json
import time

import numpy as np


def build_textures(size: int = 512):
    """Procedural material maps (the reference's Sponza textures aren't
    shipped): brick + stone diffuse, bump normal, noise roughness —
    quad-packed RGBA8 so a bilinear tap is ONE row gather.

    size defaults to 512: real Sponza ships 1024²-class maps, so the
    benched tables must exercise the LARGE-table gather path, not the
    fast sub-MB one the round-2 128² tables stayed on (VERDICT r2 #3)."""
    from vqengine_tpu.scene.texture_manager import (
        TextureManager, brick, checkerboard, noise_texture,
        normal_from_height)

    tm = TextureManager(size=size)
    tm.create_from_array("brick", brick(size))
    tm.create_from_array("stone", checkerboard(
        size, 8, (0.62, 0.58, 0.52), (0.48, 0.45, 0.42)))
    tm.create_from_array("marble", checkerboard(
        size, 4, (0.8, 0.78, 0.72), (0.7, 0.68, 0.65)))
    h = noise_texture(size, seed=21)
    tm.create_from_array("bump_n", normal_from_height(h, 1.6))
    tm.create_from_array("rough", noise_texture(size, base=0.6, amp=0.3))
    ids = {k: tm._by_key[k] for k in
           ("brick", "stone", "marble", "bump_n", "rough")}
    return tm, ids


def build_sponza_stress():
    """The Sponza-substitute colonnade + an instanced clutter cloud
    (~300k triangles), textured materials, and the reference shadow/light
    budget exercise (5 spot + 5 point + 1 dir casters,
    LightingConstantBufferData.h:42-44)."""
    from vqengine_tpu.render.scene_buffers import assemble_scene
    from vqengine_tpu.scene.light import ELightType, Light
    from vqengine_tpu.scene.mesh import build_builtin_meshes
    from vqengine_tpu.scene.scenes import (_add_object,
                                           augment_sponza_substitute)
    from vqengine_tpu.scene.serialization import FSceneRepresentation
    from vqengine_tpu.utils import math3d as m3

    rng = np.random.default_rng(42)
    rep = FSceneRepresentation(name="SponzaStress")
    material_lib = {}
    augment_sponza_substitute(rep, material_lib)

    # REAL glTF through the flagship (VERDICT r4 #6; the reference's
    # Sponza is a real glTF, Data/Levels/Sponza.xml:33 ->
    # AssetLoader::ImportGLTF): export the colonnade to a .glb at build
    # time and load it back through the real accessor/node-walk path —
    # real vertex/index buffers, per-primitive glTF materials, real UV
    # charts — replacing the builtin-mesh instancing for the architecture
    import tempfile
    from pathlib import Path

    from vqengine_tpu.scene.gltf import load_gltf_meshes
    from vqengine_tpu.scene.gltf_export import export_glb
    from vqengine_tpu.scene.serialization import (FGameObjectRepresentation,
                                                  FModelRepresentation)

    builtin = build_builtin_meshes()
    glb_objs = [(o.model.name or f"obj{i}",
                 builtin.get(o.model.builtin_mesh_name).lods[0],
                 o.transform.matrix(),
                 material_lib[o.model.material_name])
                for i, o in enumerate(rep.objects)]
    glb_path = Path(tempfile.gettempdir()) / "vqe_bench_colonnade.glb"
    export_glb(glb_objs, glb_path)
    loaded = load_gltf_meshes(glb_path)
    assert len(loaded) == len(glb_objs)
    gltf_obj = FGameObjectRepresentation()
    gltf_obj.transform = m3.Transform()
    gltf_obj.model = FModelRepresentation(path=str(glb_path),
                                          name="SponzaColonnadeGLB")
    rep.objects = [gltf_obj]

    tm, tex_ids = build_textures()
    # texture the colonnade: brick walls, stone floors, bump + roughness
    # (the glTF sub-materials carry the PBR factors; texture ids attach by
    # material name, like the reference's XML material->texture binding)
    gltf_mats = [m for _, m in loaded if m is not None]
    for m in list(material_lib.values()) + gltf_mats:
        name = m.name
        diffuse = tex_ids["brick"] if "wall" in name.lower() \
            else tex_ids["stone"]
        m.textures = {"diffuse": diffuse, "normal": tex_ids["bump_n"],
                      "roughness": tex_ids["rough"]}

    from vqengine_tpu.scene.material import Material
    for i in range(10):
        m = Material(name=f"clutter{i}")
        m.diffuse = rng.uniform(0.2, 0.9, 3).astype(np.float32)
        m.roughness = float(rng.uniform(0.05, 0.95))
        m.metalness = float(i % 3 == 0)
        m.textures = {"diffuse": tex_ids["marble"],
                      "normal": tex_ids["bump_n"],
                      "roughness": tex_ids["rough"]}
        material_lib[m.name] = m
    # fuse normal+roughness into one sampled map, then pair diffuse+aux
    # quads into single 32 B gather rows (fetch-count economy: 3 dense
    # sampled maps -> 1 row gather per pixel); the glTF sub-materials
    # ride the same upload
    all_mats = list(material_lib.values()) + gltf_mats
    tm.combine_aux_maps(all_mats)
    tm.combine_pair_quads(all_mats)
    textures = tm.build_device_arrays_packed()
    for i in range(220):
        mesh = "Sphere" if i % 2 == 0 else "Cube"
        pos = (rng.uniform(-900, 900), rng.uniform(20, 250),
               rng.uniform(-220, 220))
        s = rng.uniform(8, 30)
        _add_object(rep, mesh, pos, (s, s, s), f"clutter{rng.integers(0, 10)}",
                    rotation=m3.quat_from_euler_xyz_degrees(
                        *rng.uniform(0, 360, 3)),
                    name=f"Clutter{i}")

    lights = [Light(type=ELightType.DIRECTIONAL, brightness=1.4,
                    rotation=m3.quat_from_euler_xyz_degrees(35, 0, 25),
                    casts_shadows=True, viewport_x=2200, viewport_y=2200,
                    distance_from_origin=1500, shadow_near=1.0,
                    shadow_far=4000.0, depth_bias=0.002)]
    # 5 shadowing spot lights along the atrium ceiling, aimed down
    for i in range(5):
        lights.append(Light(
            type=ELightType.SPOT, brightness=26000.0, range=900.0,
            position=np.array([-700 + 350 * i, 420, 0], np.float32),
            rotation=m3.quat_from_euler_xyz_degrees(90, 0, 0),
            color=np.array([1.0, 0.95, 0.85], np.float32),
            inner_cone_deg=25.0, outer_cone_deg=38.0,
            casts_shadows=True, shadow_near=5.0, shadow_far=1200.0,
            depth_bias=0.004))
    # 5 shadowing point lights between the columns
    for i in range(5):
        lights.append(Light(
            type=ELightType.POINT, brightness=12000.0, range=500.0,
            position=np.array([-600 + 300 * i, 120,
                               -140 if i % 2 else 140], np.float32),
            color=rng.uniform(0.5, 1.0, 3).astype(np.float32),
            casts_shadows=True, shadow_near=2.0, shadow_far=600.0,
            depth_bias=0.15))
    # unshadowed point budget exercise
    for i in range(6):
        lights.append(Light(
            type=ELightType.POINT, brightness=8000.0, range=400.0,
            position=np.array([rng.uniform(-800, 800), 150,
                               rng.uniform(-150, 150)], np.float32),
            color=rng.uniform(0.4, 1.0, 3).astype(np.float32)))
    rep.lights = lights

    buffers, cameras, lights = assemble_scene(
        rep, builtin, material_lib, draw_light_gizmos=True,
        gltf_loader=lambda p: loaded)
    return buffers, lights, textures


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

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
    p.position = np.array([700, 170, -50], np.float32)  # the Sponza.xml camera
    p.pitch_deg = 15.0
    p.yaw_deg = -90.0
    p.fov_v_deg = 60.0
    p.near_z, p.far_z = 0.5, 4000.0
    cam = Camera(p, aspect=width / height)

    renderer = VQRendererTPU()

    n = 16
    cam_list = []
    for i in range(n):
        cam.yaw = -90.0 + 4.0 * np.sin(i * 0.15)
        cam_list.append(renderer.build_frame_constants(buffers, cam, lights))
    consts_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *cam_list)

    # static casters + static geometry: the 5+5+1 maps render once
    # (STATIC light mobility) and the per-frame cost is the visibility test
    shadow_maps = jax.jit(graph.render_shadow_maps)(scene, cam_list[0])

    # demand-sized binning capacity: probe the sweep's pair demand with
    # the front-end-only jit, then bin at a pow2 bucket with 2x headroom
    # (raster.pair_cap_bucket — the engine adopts the same bucket from
    # frame telemetry, VQRendererTPU._update_pair_bucket). The overflow
    # assert below keeps this honest: a demand spike past the bucket
    # would drop pairs and fail the run.
    from vqengine_tpu.ops import raster
    probe = jax.jit(lambda s, c: graph.probe_pair_demand(s, c, width,
                                                         height))
    dem = 0
    for i in range(n):
        ci = jax.tree_util.tree_map(lambda x: x[i], consts_batch)
        dem = max(dem, int(np.asarray(probe(scene, ci))))
    pair_cap = raster.pair_cap_bucket(dem, int(scene.num_tris_live))

    @jax.jit
    def run_n(scene, consts_batch, env, shadow_maps, textures):
        # SSR history carries ACROSS frames (the DNSR temporal path is
        # part of the measured config, VERDICT r2 #9); motion vectors feed
        # the reprojection like the reference's DNSR reproject pass.
        from vqengine_tpu.ops import ssr as ssr_ops
        hist0 = ssr_ops.init_history(height // 2, width // 2)

        def frame(carry, consts_i):
            acc, hist, oflow = carry
            out = graph.render_forward(
                scene, consts_i, width=width, height=height,
                enable_shadows=True, enable_ssao=True, enable_ssr=True,
                msaa=True, textures=textures, aniso_taps=8,
                slots_used=slots_used, enable_motion_vectors=True,
                # the stress scene is static (camera-only motion): the
                # engine's animation registry would report no moved items
                dynamic_item_ids=(),
                ssr_history=hist, pair_capacity=pair_cap,
                env=env, shadow_maps=shadow_maps)
            acc = acc + out["ldr"].sum() + out["depth"].sum()
            oflow = jnp.maximum(oflow, out["overflow"].max())
            return ((acc, out["ssr_history"], oflow),
                    ((out["tri_id"] >= 0).mean(),
                     out.get("saturation", {})))
        (total, _, oflow), (cover, sat) = jax.lax.scan(
            frame, (jnp.float32(0.0), hist0, jnp.int32(0)), consts_batch)
        return total, cover, oflow, sat

    @jax.jit
    def nop(t):
        return t + 1

    tot, cover, oflow, sat = run_n(scene, consts_batch, env, shadow_maps,
                                   textures)
    coverage = float(np.asarray(cover).mean())
    overflow = int(np.asarray(oflow))
    # adaptive-path capacity contract (VERDICT r3 #4 / r4 weak #2-3):
    # demand/cap per compaction across all frames. Over-cap is a REPORTED
    # degradation (the op keeps a graceful floor — aniso-clamped tap,
    # unrefined AO, no-SSR pixel), never a pre-JSON assert: the r4 bench
    # died on its own telemetry assert and shipped NO number. The hard
    # <=1 guarantee lives in tests/test_capacity.py on the same scene.
    sat_max = {k: round(float(np.asarray(v).max()), 3)
               for k, v in sat.items()}
    # *_demand keys are informational (unbudgeted demand at the base
    # threshold; capacity-aware threshold picks keep actual compactions
    # under cap — sparse.adaptive_threshold)
    degraded = {k: v for k, v in sat_max.items()
                if not k.endswith("_demand") and v > 1.0}
    # shed-all detection (the 171.9 run's silent quality drop): a ladder
    # that picked its all-False rung while real demand existed ran the
    # adaptive pass on NOTHING — report it as degradation, not success
    for k, v in sat_max.items():
        if (not k.endswith("_demand") and v == 0.0
                and sat_max.get(k + "_demand", 0.0) > 1.0):
            degraded[k] = "shed_all"
    _ = np.asarray(nop(jnp.zeros(4)))

    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _ = np.asarray(nop(jnp.zeros(4)))
    floor = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    tot, cover, oflow, sat = run_n(scene, consts_batch, env, shadow_maps,
                                   textures)
    _ = np.asarray(tot)
    total = time.perf_counter() - t0 - floor

    ms = float(max(total, 1e-6) / n * 1e3)
    n_tris = int(buffers.indices.shape[0])

    # per-stage ladder (VERDICT r3 #10): cumulative-config deltas ride in
    # the bench JSON so a perf regression is attributable from
    # BENCH_rN.json alone. VQE_BENCH_STAGES=0 skips (3 extra compiles;
    # the persistent XLA cache makes warm runs cheap).
    stages = {}
    import os
    if os.environ.get("VQE_BENCH_STAGES", "1") != "0":
        def timed_cfg(**kw):
            @jax.jit
            def ladder(scene, consts_batch, env, shadow_maps, textures):
                def frame(carry, consts_i):
                    out = graph.render_forward(
                        scene, consts_i, width=width, height=height,
                        env=env, pair_capacity=pair_cap, **kw)
                    return carry + out["ldr"].sum() + out["depth"].sum(), ()
                tot, _ = jax.lax.scan(frame, jnp.float32(0.0), consts_batch)
                return tot
            _ = np.asarray(ladder(scene, consts_batch, env, shadow_maps,
                                  textures))
            t0 = time.perf_counter()
            _ = np.asarray(ladder(scene, consts_batch, env, shadow_maps,
                                  textures))
            return (time.perf_counter() - t0 - floor) / n * 1e3

        t_geo = timed_cfg(enable_shadows=False, enable_ssao=False,
                          enable_ssr=False)
        t_shadow = timed_cfg(enable_shadows=True, shadow_maps=shadow_maps,
                             enable_ssao=False, enable_ssr=False)
        t_ss = timed_cfg(enable_shadows=True, shadow_maps=shadow_maps,
                         enable_ssao=True, enable_ssr=True)
        stages = {
            "geom_shade_ibl_sky": round(t_geo, 1),
            "+shadows": round(t_shadow - t_geo, 1),
            "+ssao_ssr": round(t_ss - t_shadow, 1),
            "+msaa_tex_aniso8_temporal_mv": round(ms - t_ss, 1),
        }
    print(json.dumps({
        "metric": f"sponza_stress_1080p_ms ({n_tris} tris, glTF colonnade + "
                  f"fwd PBR + MSAA4x edge-resolve + 512^2 textured aniso8 + "
                  f"5+5+1 shadows ESM + adaptive SSAO + IBL + SSR temporal, "
                  f"{len(lights)} lights)",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(16.6 / ms, 3),
        "saturation": sat_max,
        "degraded": degraded,
        "coverage": round(coverage, 3),
        "overflow": overflow,
        "stages": stages,
    }))
    # correctness contract AFTER the JSON is out (VERDICT r4 weak #3: a
    # failed assert must not destroy the telemetry)
    assert coverage > 0.5, f"stress frame mostly empty (coverage={coverage})"
    assert overflow == 0, \
        f"raster bin overflow in bench scene: {overflow} pairs dropped"


if __name__ == "__main__":
    main()
