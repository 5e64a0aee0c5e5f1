"""Round-4 triage of the 156 -> 1167 ms bench regression.

Bisects the round-3 additions on the exact bench scene: geomorph clip
transform, adaptive SSAO, SSR ray compaction, per-sample MSAA edge
resolve, 512^2 quad-packed textures, aniso8 adaptive walk, motion
vectors + SSR temporal history carry (the true BENCH config, fixed per
ADVICE r3: history threads through the scan so nothing is DCE'd).

Run alone — one TPU client at a time.
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
            hist0 = jnp.zeros((height // 2, width // 2, 4), jnp.float32)

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

        t0 = time.perf_counter()
        tot = run_n(consts_batch)
        _ = np.asarray(tot)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(consts_batch))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:32s} {ms:8.2f} ms/frame   (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    def fwd(consts, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env, **kw)
        return checksum((out["ldr"], out["depth"]))

    def fwd_hist(consts, hist, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            ssr_history=hist, **kw)
        return (checksum((out["ldr"], out["depth"]))), out["ssr_history"]

    def stage_geom(consts):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        return checksum((depth, tri_id))

    FULL = dict(enable_shadows=True, shadow_maps=shadow_maps,
                enable_ssao=True, enable_ssr=True)
    TEX = dict(textures=textures, slots_used=slots_used)

    # Most-informative-first: each row's delta vs the previous isolates
    # one round-3 addition. Printed as we go so a timeout still informs.
    timed("geometry only", stage_geom)
    timed("fwd full(no msaa,no tex)", lambda c: fwd(c, **FULL))
    timed("+msaa (no edge resolve)", lambda c: fwd(
        c, **FULL, msaa=True, msaa_edge_resolve=False))
    timed("+msaa edge resolve", lambda c: fwd(c, **FULL, msaa=True))
    timed("+tex512 aniso2", lambda c: fwd(
        c, **FULL, msaa=True, **TEX, aniso_taps=2))
    timed("+tex512 aniso8", lambda c: fwd(
        c, **FULL, msaa=True, **TEX, aniso_taps=8))
    timed("BENCH(+mv+ssr hist carry)", lambda c, h: fwd_hist(
        c, h, **FULL, msaa=True, **TEX, aniso_taps=8,
        enable_motion_vectors=True), carry_hist=True)


if __name__ == "__main__":
    main()
