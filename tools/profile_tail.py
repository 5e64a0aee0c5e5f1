"""Decompose the forward shading tail (geometry excluded) on TPU.

Each row adds one stage on top of the previous; deltas give per-stage
cost. Run alone — one axon client at a time.
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

    from vqengine_tpu.ops import ibl, shading
    from vqengine_tpu.ops import postprocess as pp
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights = build_sponza_stress()[:2]
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

    def checksum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
                   if hasattr(x, "astype"))

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
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(consts_batch))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:28s} {ms:8.2f} ms/frame", flush=True)

    def tail(consts, do_mat=True, do_shade=False, do_env=False,
             do_sky=False, do_tonemap=False):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        acc = checksum((depth, tri_id))
        wn = attrs["wnrm"]
        wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True),
                              1e-9)
        if not do_mat:
            return acc
        mat = graph.material_pass(scene, tri_id, uv=attrs["uv"], wnrm=wn,
                                  wtan=attrs["wtan"], textures=None,
                                  mrow=attrs.get("mrow"),
                                  ids=attrs.get("ids"))
        nrm = mat["normal"] if mat.get("normal") is not None else wn
        acc = acc + checksum((mat["albedo"], mat["roughness"]))
        env_illum = None
        if do_env:
            v = consts.camera_pos - attrs["wpos"]
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                                1e-9)
            env_illum = ibl.environment_illumination(
                nrm, v, mat["roughness"], mat["metalness"], mat["albedo"],
                env.diffuse_cube, list(env.specular_mips), env.brdf_lut,
                hdri_yaw=consts.hdri_yaw)
        if do_shade:
            ao = jnp.broadcast_to(consts.ambient_factor, mask.shape)
            hdr = shading.shade_forward(
                world_pos=attrs["wpos"], normal=nrm, albedo=mat["albedo"],
                roughness=mat["roughness"], metalness=mat["metalness"],
                emissive=mat["emissive"], ao=ao,
                camera_pos=consts.camera_pos,
                point_lights=consts.point_lights,
                spot_lights=consts.spot_lights,
                spot_extra=consts.spot_extra,
                directional=consts.directional,
                env_illumination=env_illum)
            acc = acc + checksum(hdr)
        elif env_illum is not None:
            hdr = env_illum
            acc = acc + checksum(hdr)
        else:
            hdr = jnp.zeros((height, width, 3))
        if do_sky:
            dirs = graph.sky_directions(consts, width, height)
            background = ibl.sky_radiance(dirs, env.equirect, consts.hdri_yaw)
            hdr = jnp.where(mask[..., None], hdr, background)
            acc = acc + checksum(hdr)
        if do_tonemap:
            acc = acc + checksum(pp.tonemap(hdr, 0))
        return acc

    timed("geom+material", lambda c: tail(c))
    timed("+shade(7 lights, no env)", lambda c: tail(c, do_shade=True))
    timed("+env_illum(IBL)", lambda c: tail(c, do_shade=True, do_env=True))
    timed("+sky+tonemap", lambda c: tail(c, do_shade=True, do_env=True,
                                         do_sky=True, do_tonemap=True))


if __name__ == "__main__":
    main()
