"""Round-5 part 2: decompose SSAO (+31 ms) and SSR (+25 ms) on the bench
scene (tools/profile_r5.py measured the block costs; this isolates the
stages inside each). Monkeypatched stubs keep the surrounding pipeline
identical so deltas are attributable (r4 lesson: measure against the
same anchor, not across stalls).

Rows:
  base: minimal (shadows+msaa, no ssao/ssr, no tex, no edge)
  SSAO: full medium | no blur | no upsample | no adaptive | 4 taps
  SSR: full | 7 steps | no denoise | dense rays (frac None) | frac 4

Run ALONE on the TPU.
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

    from vqengine_tpu.ops import ssao as ssao_mod
    from vqengine_tpu.ops import ssr as ssr_mod
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, textures = build_sponza_stress()
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

    def fwd(consts, **kw):
        base = dict(enable_shadows=True, shadow_maps=shadow_maps,
                    enable_ssao=False, enable_ssr=False, msaa=True,
                    msaa_edge_resolve=False)
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            **{**base, **kw})
        return out["ldr"].sum() + out["depth"].sum()

    which = set(sys.argv[1:]) or {"ssao", "ssr"}

    b = timed("base (no ss)", lambda c: fwd(c))

    if "ssao" in which:
        real_blur = ssao_mod._bilateral_blur
        real_up = ssao_mod.upsample_bilateral
        real_presets = dict(ssao_mod.PRESETS)

        s_full = timed("ssao medium (8+6)", lambda c: fwd(
            c, enable_ssao=True))
        ssao_mod._bilateral_blur = lambda ao, zv, **kw: ao
        s_noblur = timed("  - blur", lambda c: fwd(c, enable_ssao=True))
        ssao_mod._bilateral_blur = real_blur

        def up_nearest(ao, z_coarse, z_fine, **kw):
            fh, fw = z_fine.shape
            return jnp.repeat(jnp.repeat(ao, 2, 0), 2, 1)[:fh, :fw]
        ssao_mod.upsample_bilateral = up_nearest
        graph.ssao_ops.upsample_bilateral = up_nearest
        s_noup = timed("  - bilateral upsamples", lambda c: fwd(
            c, enable_ssao=True))
        ssao_mod.upsample_bilateral = real_up
        graph.ssao_ops.upsample_bilateral = real_up

        ssao_mod.PRESETS["medium"] = (8, 0, False)
        s_noad = timed("  - adaptive refinement", lambda c: fwd(
            c, enable_ssao=True))
        ssao_mod.PRESETS["medium"] = (4, 0, False)
        s_4tap = timed("  - adaptive, 4 base taps", lambda c: fwd(
            c, enable_ssao=True))
        ssao_mod.PRESETS.update(real_presets)
        print(f"  -> blur {s_full - s_noblur:+.1f}  "
              f"upsamples {s_full - s_noup:+.1f}  "
              f"adaptive {s_full - s_noad:+.1f}  "
              f"4 base taps save {s_noad - s_4tap:+.1f}  "
              f"(full +{s_full - b:.1f})", flush=True)

    if "ssr" in which:
        real_trace = ssr_mod.trace_reflections
        real_dn = ssr_mod.denoise_reflections

        r_full = timed("ssr full (14 steps, dense)", lambda c: fwd(
            c, enable_ssr=True))

        # finer fixed-cost attribution (r5ss3 measured: apply-composite
        # stub saves only 0.3, trace-zeros saves 11.7 of the +22.6 total
        # ⇒ ~10.6 in denoise + up2_fit upsamples + pools): stub each
        def trace_zero(scene_color, depth, *a, **kw):
            hh, ww = depth.shape
            return (jnp.zeros((hh, ww, 3), scene_color.dtype)
                    + scene_color * 1e-6,
                    jnp.zeros((hh, ww), jnp.float32) + depth * 1e-6)
        ssr_mod.trace_reflections = trace_zero
        graph.ssr_ops.trace_reflections = trace_zero
        r_notrace = timed("  - trace (zeros)", lambda c: fwd(
            c, enable_ssr=True))
        ssr_mod.trace_reflections = real_trace
        graph.ssr_ops.trace_reflections = real_trace

        def dn_pass(refl, conf, rough, history=None, motion=None,
                    depth=None, **kw):
            hist = history if history is not None \
                else jnp.zeros(refl.shape[:2] + (ssr_mod.HISTORY_CHANNELS,),
                               jnp.float32)
            return refl, hist[..., :ssr_mod.HISTORY_CHANNELS]
        ssr_mod.denoise_reflections = dn_pass
        graph.ssr_ops.denoise_reflections = dn_pass
        r_nodn = timed("  - denoiser (passthrough)", lambda c: fwd(
            c, enable_ssr=True))
        ssr_mod.denoise_reflections = real_dn
        graph.ssr_ops.denoise_reflections = real_dn

        real_up2 = graph.up2_fit

        def up2_nearest(x, h, w):
            r = -(-h // x.shape[0])
            y = jnp.repeat(jnp.repeat(x, r, 0), r, 1)
            return y[:h, :w]
        graph.up2_fit = up2_nearest
        r_noup = timed("  - up2_fit bilinear (nearest)", lambda c: fwd(
            c, enable_ssr=True))
        graph.up2_fit = real_up2

        def trace8(*a, **kw):
            kw["num_steps"] = 8
            return real_trace(*a, **kw)
        ssr_mod.trace_reflections = trace8
        graph.ssr_ops.trace_reflections = trace8
        r_s8 = timed("  - 8 march steps (vs 14)", lambda c: fwd(
            c, enable_ssr=True))
        ssr_mod.trace_reflections = real_trace
        graph.ssr_ops.trace_reflections = real_trace

        print(f"  -> trace-total {r_full - r_notrace:+.1f}  "
              f"denoiser {r_full - r_nodn:+.1f}  "
              f"up2 bilinear {r_full - r_noup:+.1f}  "
              f"steps8 save {r_full - r_s8:+.1f}  "
              f"(full +{r_full - b:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
