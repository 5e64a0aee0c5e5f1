"""Decompose SSAO cost on TPU: input slicing, pyramid build, tap loop,
bilateral blur. Run alone — one axon client at a time."""
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

    from vqengine_tpu.ops import ffx, ssao
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights = build_sponza_stress()[:2]
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

        _ = np.asarray(run_n(consts_batch))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(consts_batch))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:30s} {ms:8.2f} ms/frame", flush=True)

    def geom(consts):
        depth, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, width, height)
        wn = attrs["wnrm"]
        wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True),
                              1e-9)
        return depth, wn

    def base(consts):
        depth, wn = geom(consts)
        return checksum(depth) + checksum(wn)

    def sliced(consts):
        depth, wn = geom(consts)
        return checksum(depth[::2, ::2]) + checksum(wn[::2, ::2])

    def full_ssao(consts, taps=12, blur=True):
        depth, wn = geom(consts)
        info = {"near": consts.proj_params[0], "far": consts.proj_params[1],
                "fov_y": consts.proj_params[2], "view": consts.view_matrix}
        ao = ssao.ssao(depth[::2, ::2], wn[::2, ::2], info, num_taps=taps,
                       skip_blur=not blur)
        return checksum(ao)

    from vqengine_tpu.ops import ssr as ssr_ops

    def ssr_trace(consts, steps=24, refine=4):
        depth, wn = geom(consts)
        hdr = jnp.stack([depth, depth, depth], axis=-1)  # stand-in color
        refl, conf = ssr_ops.trace_reflections(
            hdr[::2, ::2], depth[::2, ::2], wn[::2, ::2],
            consts.view_matrix, consts.proj_params,
            num_steps=steps, refine_steps=refine)
        return checksum((refl, conf))

    def ssr_full(consts):
        depth, wn = geom(consts)
        hdr = jnp.stack([depth, depth, depth], axis=-1)
        refl, conf = ssr_ops.trace_reflections(
            hdr[::2, ::2], depth[::2, ::2], wn[::2, ::2],
            consts.view_matrix, consts.proj_params)
        rough = jnp.zeros_like(depth)[::2, ::2] + 0.3
        dn, hist = ssr_ops.denoise_reflections(refl, conf, rough)
        return checksum((dn, hist))

    timed("geometry+normalize", base)
    timed("+[::2] slices", sliced)
    timed("+ssao 2 taps no blur", lambda c: full_ssao(c, 2, False))
    timed("+ssao 12 taps no blur", lambda c: full_ssao(c, 12, False))
    timed("+ssao 12 taps + blur", lambda c: full_ssao(c, 12, True))
    timed("+ssr trace 4+1", lambda c: ssr_trace(c, 4, 1))
    timed("+ssr trace 24+4", lambda c: ssr_trace(c, 24, 4))
    timed("+ssr trace+denoise", ssr_full)


if __name__ == "__main__":
    main()
