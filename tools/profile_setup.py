"""Decompose setup_triangles + verify blocked-scan micro costs on TPU.
Run alone — one axon client at a time."""
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
        return sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree))

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
        print(f"{name:36s} {ms:8.2f} ms/frame", flush=True)
        return ms

    tl = scene.num_tris_live
    tri_item = scene.tri_item[:tl]

    def cull(c):
        return culling.cull_and_select_lod(
            c.world, scene.aabb_center, scene.aabb_extent,
            c.frustum_planes, c.view_proj, scene.item_num_lods)

    def trimask(c):
        visible, lod = cull(c)
        return culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)

    def clip_c(c):
        wvp = jnp.einsum("ij,njk->nik", c.view_proj, c.world)
        return raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)

    timed("cull+lod", lambda c: checksum(cull(c)))
    timed("cull+lod+trimask", lambda c: checksum(trimask(c)))
    timed("clip corners", lambda c: checksum(clip_c(c)))
    timed("setup_triangles (no mask)", lambda c: checksum(
        raster.setup_triangles(clip_c(c), None, width, height)))
    timed("setup_triangles (mask)", lambda c: checksum(
        raster.setup_triangles(clip_c(c), None, width, height,
                               tri_mask=trimask(c)[:tl])))

    # blocked-scan micros at the live cap
    from vqengine_tpu.ops.raster import GROUP, cdiv
    T = int(cdiv(tl, GROUP) * GROUP)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 3, T).astype(np.int32))
    oh = jnp.asarray(rng.integers(0, 2, (T, 32)).astype(np.int32))

    def micro(name, fn):
        seeds = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def run(seeds):
            def step(c, s):
                return c + fn(s), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), seeds)
            return tot

        @jax.jit
        def nop(t):
            return t + 1

        _ = np.asarray(run(seeds))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run(seeds))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:36s} {ms:8.2f} ms", flush=True)

    micro("cumsum [T] native",
          lambda s: jnp.cumsum(vals + s).sum().astype(jnp.float32))
    micro("cumsum [T,32] native",
          lambda s: jnp.cumsum(oh + s, axis=0).sum().astype(jnp.float32))
    micro("full radix pass 32",
          lambda s: raster._radix_rank_pass(
              ((vals + s) % 32).astype(jnp.int32),
              vals.astype(jnp.uint32), 32).sum().astype(jnp.float32))


if __name__ == "__main__":
    main()
