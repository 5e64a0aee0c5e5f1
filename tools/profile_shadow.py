"""Decompose the per-frame shadow cost (5+5+1 ESM budget) on TPU:
visibility gathers per caster type, upsampling, and the shaded-light
radiance accumulation. Run alone — one axon client at a time."""
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

    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights = build_sponza_stress()[:2]
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
    shadow_maps = jax.jit(graph.render_shadow_maps)(scene, cam_list[0])

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
        print(f"{name:34s} {ms:8.2f} ms/frame", flush=True)

    def geom(consts):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        wn = attrs["wnrm"]
        wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True),
                              1e-9)
        return depth, attrs["wpos"], wn, mask, attrs

    def base(consts):
        depth, wpos, wn, mask, attrs = geom(consts)
        return checksum((depth, wpos, wn))

    def vis_only(consts, sc, pc, dir_on):
        from vqengine_tpu.ops import shadow
        depth, wpos, wn, mask, attrs = geom(consts)
        wp = graph.pool2(wpos)
        acc = jnp.float32(0.0)
        for i in range(sc):
            acc += shadow.shadow_test_esm(
                wp, consts.spot_caster_vps[i], shadow_maps["spot"][i],
                consts.spot_casters[i][11]).sum()
        for i in range(pc):
            lrow = consts.point_casters[i]
            acc += shadow.omni_shadow_test_esm(
                wp, lrow[0:3], shadow_maps["point"][i], lrow[9],
                lrow[8]).sum()
        if dir_on:
            acc += shadow.shadow_test_esm(
                wp, consts.dir_vp[0], shadow_maps["dir"],
                consts.directional[7]).sum()
        return acc

    def full_pass(consts):
        depth, wpos, wn, mask, attrs = geom(consts)
        sv, pv, dv = graph.shadow_pass(scene, consts, wpos, wn,
                                       shadow_maps=shadow_maps)
        return checksum((sv, pv, dv))

    def shade_with(consts, enable_shadows):
        from vqengine_tpu.ops import shading
        depth, wpos, wn, mask, attrs = geom(consts)
        mat = graph.material_pass(scene, None, mrow=attrs["mrow"],
                                  ids=attrs["ids"])
        sv = pv = dv = None
        if enable_shadows:
            sv, pv, dv = graph.shadow_pass(scene, consts, wpos, wn,
                                           shadow_maps=shadow_maps)
        hdr = shading.shade_forward(
            world_pos=wpos, normal=wn, albedo=mat["albedo"],
            roughness=mat["roughness"], metalness=mat["metalness"],
            emissive=mat["emissive"],
            ao=jnp.broadcast_to(consts.ambient_factor, mask.shape),
            camera_pos=consts.camera_pos,
            point_lights=consts.point_lights,
            spot_lights=consts.spot_lights,
            spot_extra=consts.spot_extra,
            directional=consts.directional,
            point_casters=consts.point_casters if enable_shadows else None,
            point_shadow=pv,
            spot_casters=consts.spot_casters if enable_shadows else None,
            spot_caster_extra=(consts.spot_caster_extra
                               if enable_shadows else None),
            spot_shadow=sv, dir_shadow=dv)
        return checksum(hdr)

    timed("geometry base", base)
    timed("+dir vis only", lambda c: vis_only(c, 0, 0, True))
    timed("+5 spot vis", lambda c: vis_only(c, 5, 0, False))
    timed("+5 point vis", lambda c: vis_only(c, 0, 5, False))
    timed("+full shadow_pass (11+up)", full_pass)
    timed("shade no shadows", lambda c: shade_with(c, False))
    timed("shade + 11 casters", lambda c: shade_with(c, True))


if __name__ == "__main__":
    main()
