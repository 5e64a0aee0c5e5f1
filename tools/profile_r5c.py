"""Round-5c A/B ladder: every row is the FULL bench config (neighbor edge
resolve + tex aniso8 + motion vectors + ssao + ssr + shadows + msaa) with
ONE knob changed, so deltas are honest against XLA overlap (r4 lesson:
stage deltas on a lean pipeline only).

Knobs under test (from the r5 decomposition, /tmp/r5_ss.log):
  ssao=dense12 / deint8   the medium preset's adaptive refinement costs
                          +11.9 ms of compaction overhead while base taps
                          are ~1.15 ms each — dense or deinterleaved taps
                          may beat 8+6-adaptive outright
  edge cap frac 32        neighbor edge resolve is cap-proportional
  tex walk frac 32        so is the aniso ellipse walk
  tex taps4               walk tap count halved
  combo                   the pre-registered best guess of the above

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

    from vqengine_tpu.ops import ssao as ssao_ops
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
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run_n(consts_batch))
            best = min(best, time.perf_counter() - t0)
        ms = (best - floor) / n * 1e3
        print(f"{name:34s} {ms:8.2f} ms/frame", flush=True)
        return ms

    def fwd(consts, aniso_taps=8, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            enable_shadows=True, shadow_maps=shadow_maps,
            enable_ssao=True, enable_ssr=True, msaa=True,
            msaa_edge_resolve="neighbor", textures=textures,
            aniso_taps=aniso_taps, slots_used=slots_used,
            enable_motion_vectors=True, dynamic_item_ids=(), **kw)
        return out["ldr"].sum() + out["depth"].sum()

    which = set(sys.argv[1:]) or {"ssao", "caps", "combo"}

    base = timed("FULL (ssr dense, ladder blockmax)", fwd)

    med0 = ssao_ops.PRESETS["medium"]
    if "ssao" in which:
        ssao_ops.PRESETS["medium"] = (12, 0, False)
        d12 = timed("ssao medium = dense 12", fwd)
        ssao_ops.PRESETS["medium"] = (8, 0, True)
        de8 = timed("ssao medium = deint 8", fwd)
        ssao_ops.PRESETS["medium"] = med0
        print(f"  -> dense12 {d12 - base:+.1f}  deint8 {de8 - base:+.1f}",
              flush=True)

    if "caps" in which:
        graph.MSAA_EDGE_CAP_FRAC = 32
        e32 = timed("edge cap frac 32", fwd)
        graph.MSAA_EDGE_CAP_FRAC = 16
        graph.TEX_ANISO_WALK_FRAC = 32
        t32 = timed("tex walk frac 32", fwd)
        graph.TEX_ANISO_WALK_FRAC = 16
        t4 = timed("tex walk taps 4", lambda c: fwd(c, aniso_taps=4))
        print(f"  -> edge32 {e32 - base:+.1f}  walk32 {t32 - base:+.1f}  "
              f"taps4 {t4 - base:+.1f}", flush=True)

    if "edgen" in which:
        # compacted neighbor match (EDGE_NEIGHBOR_COMPACT) vs the dense
        # full-frame 4-neighbor select
        graph.EDGE_NEIGHBOR_COMPACT = False
        ed = timed("edge neighbor DENSE select", fwd)
        graph.EDGE_NEIGHBOR_COMPACT = True
        print(f"  -> dense-select {ed - base:+.1f} vs compact base",
              flush=True)

    if "combo" in which:
        ssao_ops.PRESETS["medium"] = (12, 0, False)
        graph.MSAA_EDGE_CAP_FRAC = 32
        graph.TEX_ANISO_WALK_FRAC = 32
        combo = timed("COMBO dense12+edge32+walk32", fwd)
        ssao_ops.PRESETS["medium"] = med0
        graph.MSAA_EDGE_CAP_FRAC = 16
        graph.TEX_ANISO_WALK_FRAC = 16
        print(f"  -> combo {combo - base:+.1f} vs base", flush=True)


if __name__ == "__main__":
    main()
