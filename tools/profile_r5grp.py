"""Round-5 GROUP A/B: the raster kernel's evaluated-slot floor is
~tiles * GROUP (segment bounds round to whole groups; at the bench's
42k-pair demand over 1020 tiles that floor dominates the real work).
Run the FULL bench config at VQE_GROUP = argv[1] (raster.py reads the
env at import). Fresh process per setting:

    python tools/profile_r5grp.py 64
    python tools/profile_r5grp.py 32

Run ALONE on the TPU (one axon client; no CPU-heavy work concurrently).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

if len(sys.argv) > 1:
    os.environ["VQE_GROUP"] = sys.argv[1]

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

    probe = jax.jit(lambda s, c: graph.probe_pair_demand(s, c, width,
                                                         height))
    dem = 0
    for i in range(n):
        ci = jax.tree_util.tree_map(lambda x: x[i], consts_batch)
        dem = max(dem, int(np.asarray(probe(scene, ci))))
    pair_cap = raster.pair_cap_bucket(dem, int(scene.num_tris_live))
    print(f"GROUP={raster.GROUP} demand={dem} pair_cap={pair_cap}",
          flush=True)

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

    def fwd(consts):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            enable_shadows=True, shadow_maps=shadow_maps,
            enable_ssao=True, enable_ssr=True, msaa=True,
            msaa_edge_resolve="neighbor", textures=textures,
            aniso_taps=8, slots_used=slots_used,
            enable_motion_vectors=True, dynamic_item_ids=(),
            pair_capacity=pair_cap)
        return out["ldr"].sum() + out["depth"].sum()

    def f_geo(consts):
        depth, tri_id, attrs, mask, cov = graph.geometry_pass(
            scene, consts, width, height, msaa=True,
            pair_capacity=pair_cap)
        s = depth.sum() + tri_id.sum().astype(jnp.float32)
        if cov is not None:
            s = s + cov.sum()
        return s

    timed(f"geometry 4x (GROUP={raster.GROUP})", f_geo)
    timed(f"FULL bench cfg (GROUP={raster.GROUP})", fwd)


if __name__ == "__main__":
    main()
