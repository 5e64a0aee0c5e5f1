"""Bisect the round-5 PCF TPU worker crash (kernel fault) seen when
profile_r5's PCF row ran the FULL bench config with shadow_filter=pcf.

Stages, each readback-verified before the next (run ALONE on the TPU):
  1. render PCF maps (full-res raw depth, 5 spot + 5 point-cube + dir)
  2. one full-frame shadow_pass with filter=pcf (no ssao/ssr/msaa)
  3. full anchor config with pcf (msaa+ssao+ssr)
Whichever stage kills the worker is the culprit.
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

    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg, p.yaw_deg = 15.0, -90.0
    p.fov_v_deg, p.near_z, p.far_z = 60.0, 0.5, 4000.0
    cam = Camera(p, aspect=width / height)
    consts = VQRendererTPU().build_frame_constants(buffers, cam, lights)

    t0 = time.perf_counter()
    pcf_maps = jax.jit(lambda s, c: graph.render_shadow_maps(
        s, c, filter_mode="pcf"))(scene, consts)
    chk = sum(float(np.asarray(v.astype(jnp.float32).sum()))
              for v in jax.tree_util.tree_leaves(pcf_maps))
    print(f"stage 1 ok ({time.perf_counter()-t0:.1f}s): pcf maps "
          f"checksum {chk:.3e}", flush=True)

    t0 = time.perf_counter()
    out = jax.jit(lambda s, c, e, m: graph.render_forward(
        s, c, width=width, height=height, env=e,
        enable_shadows=True, shadow_maps=m, shadow_filter="pcf",
        enable_ssao=False, enable_ssr=False, msaa=False)["ldr"].sum())(
            scene, consts, env, pcf_maps)
    print(f"stage 2 ok ({time.perf_counter()-t0:.1f}s): "
          f"plain pcf frame checksum {float(np.asarray(out)):.3e}",
          flush=True)

    t0 = time.perf_counter()
    out = jax.jit(lambda s, c, e, m: graph.render_forward(
        s, c, width=width, height=height, env=e,
        enable_shadows=True, shadow_maps=m, shadow_filter="pcf",
        enable_ssao=True, enable_ssr=True, msaa=True,
        msaa_edge_resolve=False)["ldr"].sum())(
            scene, consts, env, pcf_maps)
    print(f"stage 3 ok ({time.perf_counter()-t0:.1f}s): "
          f"anchor pcf frame checksum {float(np.asarray(out)):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
