"""Round-4 regression bisect, part 3: decompose the MSAA edge resolve
(ladder part 2 measured full+msaa no-edge = 140 ms vs EDGE resolve =
983 ms — the +843 ms IS the r3 regression). Isolates:
  resolve-only (detect+compact+per-sample visibility)
  + record attr interp
  + secondary material/shading (no env)
  + env illumination
  + scatters/blend (the full path)
Run alone on the TPU."""
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

        tot = run_n(consts_batch)
        _ = np.asarray(tot)
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

    def geo(consts, stage: str):
        """geometry_pass + edge-resolve pieces: deltas against the bare
        geometry row price each piece without the rest of the pipeline."""
        from vqengine_tpu.ops import msaa as msaa_ops
        from vqengine_tpu.ops import raster

        depth, tri_id, attrs, mask, cov_s = graph.geometry_pass(
            scene, consts, width, height, msaa=True)
        cs = checksum((depth, tri_id.astype(jnp.float32)))
        if stage == "geo":
            return cs
        object_id = attrs["ids"][..., 0].astype(jnp.int32)
        records = attrs["records"]
        cap = -(-max(4096, (width * height) // 16) // 8) * 8
        idx, live, sec_id, n_sec, px, py = msaa_ops.resolve_secondary(
            records, tri_id, depth, object_id, mask, cov_s, cap)
        if stage == "detect":
            # detect + compact + neighbor candidates only: checksum keeps
            # idx/live, DCEs the per-sample plane re-test outputs
            return cs + checksum((idx, live))
        if stage == "resolve":
            return cs + checksum((idx, live, sec_id, n_sec))
        rec = records[jnp.maximum(sec_id, 0)]
        a = raster.interp_record_attrs(rec, px, py)
        return cs + checksum((a["depth"], a["uv"], a["wnrm"]))

    timed("geometry only (msaa gbuf)", lambda c: geo(c, "geo"))
    timed("+detect/compact/candidates", lambda c: geo(c, "detect"))
    timed("+per-sample re-test", lambda c: geo(c, "resolve"))
    timed("+record interp", lambda c: geo(c, "interp"))
    timed("full no-edge (anchor)", lambda c: checksum(graph.render_forward(
        scene, c, width=width, height=height, env=env,
        msaa_edge_resolve=False, **base)["ldr"]))
    timed("FULL edge resolve", lambda c: checksum(graph.render_forward(
        scene, c, width=width, height=height, env=env, **base)["ldr"]))


if __name__ == "__main__":
    main()
