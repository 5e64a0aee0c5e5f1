"""Round-5 profiler: edge-resolve modes + texture decomposition on the
bench scene, measured on a LEAN pipeline (r4 lesson: stage deltas on top
of a stall are not additive — always compare against the same anchor).

Rows (cumulative config unless noted):
  anchor            full config, msaa, NO edge resolve, NO textures
  edge=shade        + edge resolve, sparse secondary shade (r4 path)
  edge=neighbor     + edge resolve, neighbor-color blend (r5 path)
  tex1              anchor + textures aniso_taps=1 (dense single tap+aux)
  tex2              anchor + textures aniso_taps=2 (dense 2-tap walk)
  tex8              anchor + textures aniso_taps=8 adaptive (bench config)
  FULL r5           edge=neighbor + tex8 (the bench config)

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
            scene, consts, width=width, height=height, env=env,
            **{**base, **kw})
        return out["ldr"].sum() + out["depth"].sum()

    which = set(sys.argv[1:]) or {"edge", "tex", "full"}

    if "ss" in which:
        m0 = timed("minimal (shadows, msaa, no ss)", lambda c: fwd(
            c, msaa_edge_resolve=False, enable_ssao=False,
            enable_ssr=False))
        mao = timed("+ssao", lambda c: fwd(
            c, msaa_edge_resolve=False, enable_ssr=False))
        msr = timed("+ssr (no ssao)", lambda c: fwd(
            c, msaa_edge_resolve=False, enable_ssao=False))
        print(f"  -> ssao +{mao - m0:.1f}  ssr +{msr - m0:.1f}", flush=True)

    if "pcf" in which:
        # VERDICT r4 #8: PCF at the full 5+5+1 budget vs the ESM default
        pcf_maps = jax.jit(lambda s, c: graph.render_shadow_maps(
            s, c, filter_mode="pcf"))(scene, cam_list[0])
        e_ref = timed("shadows ESM (ladder cfg)", lambda c: fwd(
            c, msaa_edge_resolve=False))
        p_ref = timed("shadows PCF 5+5+1", lambda c: graph.render_forward(
            scene, c, width=width, height=height, env=env,
            enable_shadows=True, shadow_maps=pcf_maps, shadow_filter="pcf",
            enable_ssao=True, enable_ssr=True, msaa=True,
            msaa_edge_resolve=False)["ldr"].sum())
        print(f"  -> PCF delta vs ESM: {p_ref - e_ref:+.1f} ms", flush=True)

    a = timed("anchor (no edge, no tex)",
              lambda c: fwd(c, msaa_edge_resolve=False))
    if "edge" in which:
        s = timed("edge=shade", lambda c: fwd(c, msaa_edge_resolve="shade"))
        nb = timed("edge=neighbor",
                   lambda c: fwd(c, msaa_edge_resolve="neighbor"))
        print(f"  -> edge shade +{s - a:.1f}  neighbor +{nb - a:.1f}",
              flush=True)
    if "tex" in which:
        t1 = timed("tex aniso1 (1 tap + aux)", lambda c: fwd(
            c, msaa_edge_resolve=False, textures=textures, aniso_taps=1,
            slots_used=slots_used))
        t2 = timed("tex aniso2 (dense walk)", lambda c: fwd(
            c, msaa_edge_resolve=False, textures=textures, aniso_taps=2,
            slots_used=slots_used))
        t8 = timed("tex aniso8 adaptive", lambda c: fwd(
            c, msaa_edge_resolve=False, textures=textures, aniso_taps=8,
            slots_used=slots_used))
        print(f"  -> tex1 +{t1 - a:.1f}  tex2 +{t2 - a:.1f}  "
              f"tex8 +{t8 - a:.1f}", flush=True)
    if "full" in which:
        f = timed("FULL r5 (neighbor + tex8 + mv)", lambda c: fwd(
            c, msaa_edge_resolve="neighbor", textures=textures,
            aniso_taps=8, slots_used=slots_used,
            enable_motion_vectors=True, dynamic_item_ids=()))
        print(f"  -> FULL estimate {f:.1f} (+hist carry ~5)", flush=True)


if __name__ == "__main__":
    main()
