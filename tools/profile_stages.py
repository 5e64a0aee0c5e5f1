"""Per-stage device timing for the render pipeline on real TPU.

Timing technique (the tunnel acks block_until_ready early, and every
readback costs ~30 ms): run each stage N times inside one jitted lax.scan
whose carry depends on the stage output (checksum), read back one scalar,
subtract the measured readback floor, divide by N.
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, n, *args):
    """Time fn over n scan iterations. Each iteration perturbs the first
    float leaf by a tiny per-iteration epsilon so XLA cannot hoist the
    computation out of the scan as loop-invariant (which would make the
    measurement an n-fold underestimate)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, eps):
            # perturb: add eps (~1e-12) to every float leaf
            def bump(l):
                if hasattr(l, "dtype") and l.dtype == jnp.float32:
                    return l + eps
                return l
            args_i = jax.tree_util.tree_map(bump, args)
            out = fn(*args_i)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")]
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return carry + s, ()
        total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(n, dtype=jnp.float32) * 1e-12)
        return total

    @jax.jit
    def nop(t):
        return t + 1

    r = run(args)
    _ = np.asarray(r)  # compile+warm
    _ = np.asarray(nop(jnp.zeros(4)))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _ = np.asarray(nop(jnp.zeros(4)))
    floor = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    _ = np.asarray(run(args))
    return (time.perf_counter() - t0 - floor) / n * 1e3


def main():
    stages = set(sys.argv[1:]) or {"bin", "raster", "resolve", "shade", "cull"}
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench
    from vqengine_tpu.ops import culling, raster, shading
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights = bench.build_stress_scene()
    scene = graph.upload_scene(buffers)
    p = FCameraParameters()
    p.position = np.array([0, 4, -6], np.float32)
    p.pitch_deg = 5.0
    p.fov_v_deg = 70.0
    p.near_z, p.far_z = 0.1, 1000.0
    cam = Camera(p, aspect=width / height)
    consts = VQRendererTPU().build_frame_constants(buffers, cam, lights)
    n = 8

    if "full" in stages:
        def stage_full(scene, consts):
            out = graph.render_forward(scene, consts, width=width, height=height)
            return out["ldr"], out["depth"]
        print("full render_forward:          ",
              f"{timed(stage_full, n, scene, consts):8.2f} ms", flush=True)

    if "vertex" in stages:
        def stage_vertex(scene, consts):
            pos4 = jnp.concatenate([scene.positions,
                                    jnp.ones_like(scene.positions[:, :1])], 1)
            wq = consts.world[scene.item_of_vertex]
            wpos = jnp.einsum("vij,vj->vi", wq, pos4)[:, :3]
            nq = consts.normal_mats[scene.item_of_vertex]
            wnrm = jnp.einsum("vij,vj->vi", nq, scene.normals)
            wtan = jnp.einsum("vij,vj->vi", nq, scene.tangents)
            return wpos, wnrm, wtan
        print("vertex world transforms:      ",
              f"{timed(stage_vertex, n, scene, consts):8.2f} ms", flush=True)

    if "material" in stages:
        import functools
        @jax.jit
        def mk_tid(scene, consts):
            wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
            clip = raster.transform_clip_instanced(
                scene.positions, scene.item_of_vertex, wvp)
            setup = raster.setup_triangles(clip, scene.indices, width, height)
            binned = raster.bin_triangles(setup, width, height)
            _, tid = raster.rasterize(binned, width, height)
            return tid
        tid_m = mk_tid(scene, consts)
        def stage_material(scene, tid):
            m = graph.material_pass(scene, tid)
            return m["albedo"], m["roughness"]
        print("material pass gathers:        ",
              f"{timed(stage_material, n, scene, tid_m):8.2f} ms", flush=True)

    # stage 1: vertex transform + setup + binning
    def stage_bin(scene, consts):
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        clip = raster.transform_clip_instanced(scene.positions,
                                               scene.item_of_vertex, wvp)
        setup = raster.setup_triangles(clip, scene.indices, width, height)
        binned = raster.bin_triangles(setup, width, height)
        return binned.pairs.sum(), binned.starts

    if "bin" in stages:
        print("bin (xform+setup+sort+gather):",
              f"{timed(stage_bin, n, scene, consts):8.2f} ms", flush=True)

    # stage 2: full geometry incl. raster
    def stage_raster(scene, consts):
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        clip = raster.transform_clip_instanced(scene.positions,
                                               scene.item_of_vertex, wvp)
        setup = raster.setup_triangles(clip, scene.indices, width, height)
        binned = raster.bin_triangles(setup, width, height)
        depth, tid = raster.rasterize(binned, width, height)
        return depth, tid

    if "raster" in stages:
        print("bin + raster kernel:          ",
              f"{timed(stage_raster, n, scene, consts):8.2f} ms", flush=True)

    if not (stages & {"resolve", "shade"}):
        return

    # precompute a fixed visibility buffer for resolve/shading isolation
    # (one jitted call — eager dispatch over the tunnel is minutes)
    @jax.jit
    def precompute(scene, consts):
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        clip = raster.transform_clip_instanced(scene.positions,
                                               scene.item_of_vertex, wvp)
        setup = raster.setup_triangles(clip, scene.indices, width, height)
        binned = raster.bin_triangles(setup, width, height)
        depth, tid = raster.rasterize(binned, width, height)
        pos4 = jnp.concatenate([scene.positions,
                                jnp.ones_like(scene.positions[:, :1])], 1)
        wq = consts.world[scene.item_of_vertex]
        wpos = jnp.einsum("vij,vj->vi", wq, pos4)[:, :3]
        nq = consts.normal_mats[scene.item_of_vertex]
        wnrm = jnp.einsum("vij,vj->vi", nq, scene.normals)
        return setup, tid, wpos, wnrm

    setup0, tid0, wpos0, wnrm0 = precompute(scene, consts)

    def stage_resolve(tid, setup, scene, wpos, wnrm):
        attrs, mask = raster.resolve_attributes(
            tid, setup, scene.indices,
            {"wpos": wpos, "wnrm": wnrm, "uv": scene.uvs})
        return attrs["wpos"], attrs["wnrm"], mask

    if "resolve" in stages:
        print("resolve (vis-buffer gathers): ",
              f"{timed(stage_resolve, n, tid0, setup0, scene, wpos0, wnrm0):8.2f} ms",
              flush=True)

    if "shade" not in stages and "cull" not in stages:
        return

    @jax.jit
    def precompute2(scene, tid0, setup0, wpos0, wnrm0):
        attrs, _ = raster.resolve_attributes(
            tid0, setup0, scene.indices, {"wpos": wpos0, "wnrm": wnrm0})
        mat = graph.material_pass(scene, tid0)
        nrm = attrs["wnrm"]
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        return attrs["wpos"], nrm, mat

    wp0, nrm0, mat0 = precompute2(scene, tid0, setup0, wpos0, wnrm0)

    def stage_shade(wpos, nrm, mat, consts):
        return shading.shade_forward(
            world_pos=wpos, normal=nrm, albedo=mat["albedo"],
            roughness=mat["roughness"], metalness=mat["metalness"],
            emissive=mat["emissive"],
            ao=jnp.full(wpos.shape[:-1], 0.055),
            camera_pos=consts.camera_pos,
            point_lights=consts.point_lights, spot_lights=consts.spot_lights,
            spot_extra=consts.spot_extra, directional=consts.directional)

    if "shade" in stages:
        print("shade (13 lights fwd PBR):    ",
              f"{timed(stage_shade, n, wp0, nrm0, mat0, consts):8.2f} ms",
              flush=True)

    def stage_cull(scene, consts):
        return culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)

    if "cull" in stages:
        print("cull+lod:                     ",
              f"{timed(stage_cull, n, scene, consts):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
