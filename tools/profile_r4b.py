"""Round-4 part 5: after block compaction the ladder reads anchor 157.4
(+17 vs pre-block), edge +8.7, aniso8 adaptive +70, mv +19.7. This tool:

1. FIRST prints saturation (demand/cap) for every adaptive path on the
   full bench config — bench.py hard-asserts <= 1, and block mode
   inflates demand by 1/occupancy, so this gates the next bench run.
2. Bisects the +17 anchor drift: ssao/ssr compaction block=8 vs
   element mode (monkeypatched).
3. Prices the aniso8 walk at adaptive_frac 4 (current) / 8 / 16 — the
   walk cost is proportional to cap, not demand, so if demand allows,
   frac=16 cuts the +70 to ~+18.

Run alone on the TPU."""
from __future__ import annotations

import functools
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

    from vqengine_tpu.ops import sparse
    from vqengine_tpu.ops import texture as tex_mod
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

    base = dict(enable_shadows=True, shadow_maps=shadow_maps,
                enable_ssao=True, enable_ssr=True, msaa=True)
    tex_kw = dict(textures=textures, aniso_taps=8, slots_used=slots_used)

    # ---- 1. saturation stats (before any timing: gates bench.py) ----
    @jax.jit
    def sat_stats(consts_batch):
        def one(consts):
            out = graph.render_forward(
                scene, consts, width=width, height=height, env=env,
                **base, **tex_kw)
            return {k: v.astype(jnp.float32)
                    for k, v in out.get("saturation", {}).items()}

        def step(carry, consts_i):
            s = one(consts_i)
            return {k: jnp.maximum(carry[k], s[k]) for k in carry}, None
        s0 = jax.tree_util.tree_map(
            lambda x: x * 0.0,
            one(jax.tree_util.tree_map(lambda x: x[0], consts_batch)))
        s, _ = jax.lax.scan(step, s0, consts_batch)
        return s

    sat = {k: float(np.asarray(v)) for k, v in
           sat_stats(consts_batch).items()}
    print("saturation max/16 frames: "
          + " ".join(f"{k}={v:.3f}" for k, v in sorted(sat.items())),
          flush=True)

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
        print(f"{name:36s} {ms:8.2f} ms/frame", flush=True)
        return ms

    def fwd(consts, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            **base, **kw)
        return checksum(out["ldr"])

    real_compact = sparse.compact_indices

    def compact_elementwise(mask, cap, block=1):
        return real_compact(mask, cap, block=1)

    # ---- 2. anchor drift bisect: block vs element ssao/ssr compaction
    timed("anchor (block=8 everywhere)", lambda c: fwd(
        c, msaa_edge_resolve=False))
    sparse.compact_indices = compact_elementwise
    timed("anchor (element compaction)", lambda c: fwd(
        c, msaa_edge_resolve=False))
    sparse.compact_indices = real_compact

    # ---- 3. aniso8 walk vs adaptive_frac ----
    real_aniso = tex_mod.sample_texture_array_aniso

    def frac_override(frac):
        @functools.wraps(real_aniso)
        def f(*a, adaptive_frac=None, **kw):
            return real_aniso(
                *a, adaptive_frac=None if adaptive_frac is None else frac,
                **kw)
        return f

    timed("full tex aniso8 frac4 (current)", lambda c: fwd(c, **tex_kw))
    tex_mod.sample_texture_array_aniso = frac_override(8)
    timed("full tex aniso8 frac8", lambda c: fwd(c, **tex_kw))
    tex_mod.sample_texture_array_aniso = frac_override(16)
    timed("full tex aniso8 frac16", lambda c: fwd(c, **tex_kw))
    tex_mod.sample_texture_array_aniso = real_aniso


if __name__ == "__main__":
    main()
