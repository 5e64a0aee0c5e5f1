"""Round-4 regression bisect, part 2: the rows the first ladder didn't
reach (it measured through full+msaa(no edge) = 139.7 ms; BENCH_r03 =
1166.7). Isolates {msaa edge resolve, textures aniso2, aniso8 adaptive,
motion vectors, SSR temporal history}. Run alone on the TPU."""
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
        # robust floor: median of 7 nop readbacks (the tunnel hiccups)
        floors = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(nop(jnp.zeros(4)))
            floors.append(time.perf_counter() - t0)
        floor = float(np.median(floors))
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            _ = np.asarray(run_n(consts_batch))
            best = min(best, time.perf_counter() - t0)
        ms = (best - floor) / n * 1e3
        print(f"{name:34s} {ms:8.2f} ms/frame", flush=True)
        return ms

    base = dict(enable_shadows=True, shadow_maps=shadow_maps,
                enable_ssao=True, enable_ssr=True, msaa=True)

    def fwd(consts, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env, **kw)
        cs = checksum((out["ldr"], out["depth"]))
        if "motion" in out:
            cs = cs + checksum(out["motion"])
        return cs

    def fwd_hist(consts, hist, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            ssr_history=hist, **kw)
        return checksum((out["ldr"], out["depth"])), out["ssr_history"]

    timed("full+msaa no-edge (anchor)", lambda c: fwd(
        c, msaa_edge_resolve=False, **base))
    timed("full+msaa EDGE resolve", lambda c: fwd(c, **base))
    timed("+tex aniso2", lambda c: fwd(
        c, textures=textures, aniso_taps=2, slots_used=slots_used, **base))
    timed("+tex aniso8 adaptive", lambda c: fwd(
        c, textures=textures, aniso_taps=8, slots_used=slots_used, **base))
    timed("+motion vectors", lambda c: fwd(
        c, textures=textures, aniso_taps=8, slots_used=slots_used,
        enable_motion_vectors=True, dynamic_item_ids=(), **base))
    timed("BENCH (+hist carry)", lambda c, h: fwd_hist(
        c, h, textures=textures, aniso_taps=8, slots_used=slots_used,
        enable_motion_vectors=True, dynamic_item_ids=(), **base),
        carry_hist=True)


if __name__ == "__main__":
    main()
