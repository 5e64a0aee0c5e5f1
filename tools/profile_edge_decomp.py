"""Round-4 part 4: decompose the REMAINING +56 ms of the (lane-gather-
fixed) MSAA edge resolve (tools/profile_msaa_edge.py: detect+compact +22,
re-test ~0, interp ~0 => ~34 ms unattributed in the sparse secondary
shade + scatters). Monkeypatches the pieces called from
graph._msaa_edge_secondary — they run there on [1, CAP] shapes, vs the
dense pass's [H, W], so shape-dispatched stubs isolate the edge-path
copies without touching the dense pass.

Also prints edge-demand stats in 4/8/16-pixel-block units for the
planned block compaction (the 2M-element compaction scatter is the +22).

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

    from vqengine_tpu.ops import ibl as ibl_mod
    from vqengine_tpu.ops import msaa as msaa_mod
    from vqengine_tpu.ops import shading as shading_mod
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
        print(f"{name:36s} {ms:8.2f} ms/frame", flush=True)
        return ms

    base = dict(enable_shadows=True, shadow_maps=shadow_maps,
                enable_ssao=True, enable_ssr=True, msaa=True)

    def fwd(consts, **kw):
        out = graph.render_forward(
            scene, consts, width=width, height=height, env=env,
            **base, **kw)
        return checksum(out["ldr"])

    # the edge path's calls are distinguishable by shape: [1, CAP] leading
    # dims vs the dense pass's [H, W]
    cap = -(-max(4096, (width * height) // 16) // 8) * 8

    def is_edge_shape(x):
        return x.ndim >= 2 and x.shape[0] == 1 and x.shape[1] == cap

    real_shade = shading_mod.shade_forward
    real_env = ibl_mod.environment_illumination
    real_resolve = msaa_mod.resolve_secondary

    def stub_shade(world_pos=None, normal=None, albedo=None, **kw):
        if is_edge_shape(world_pos):
            return albedo * 0.5
        return real_shade(world_pos=world_pos, normal=normal,
                          albedo=albedo, **kw)

    def stub_env(normal, view, roughness, metalness, albedo, *a, **kw):
        if is_edge_shape(normal):
            return albedo * 0.25
        return real_env(normal, view, roughness, metalness, albedo,
                        *a, **kw)

    timed("anchor: no edge resolve", lambda c: fwd(
        c, msaa_edge_resolve=False))

    # stub BOTH shade+env: what's left is detect/compact/re-test/interp/
    # unproject/palette/gathers/scatters
    shading_mod.shade_forward = stub_shade
    graph.shading.shade_forward = stub_shade
    ibl_mod.environment_illumination = stub_env
    graph.ibl.environment_illumination = stub_env
    timed("edge, shade+env stubbed", lambda c: fwd(c))

    # real direct shade, env stubbed
    shading_mod.shade_forward = real_shade
    graph.shading.shade_forward = real_shade
    timed("edge, env stubbed", lambda c: fwd(c))

    # full
    ibl_mod.environment_illumination = real_env
    graph.ibl.environment_illumination = real_env
    timed("edge, FULL", lambda c: fwd(c))

    # edge-demand stats for the block-compaction design: demand in
    # elements and in 4/8/16-lane raster-order blocks, max across frames
    from vqengine_tpu.ops import sparse

    @jax.jit
    def demand_stats(consts_batch):
        def one(consts):
            depth, tri_id, attrs, mask, cov_s = graph.geometry_pass(
                scene, consts, width, height, msaa=True)
            object_id = attrs["ids"][..., 0].astype(jnp.int32)
            edge = msaa_mod.detect_edges(tri_id, depth, object_id, mask)
            flat = edge.reshape(-1)
            out = [flat.sum()]
            for b in (4, 8, 16):
                out.append(flat.reshape(-1, b).any(axis=1).sum())
            return jnp.stack([o.astype(jnp.int32) for o in out])

        def step(carry, consts_i):
            return jnp.maximum(carry, one(consts_i)), None
        m, _ = jax.lax.scan(step, jnp.zeros(4, jnp.int32), consts_batch)
        return m

    m = np.asarray(demand_stats(consts_batch))
    print(f"edge demand max over {n} frames: elements={m[0]} "
          f"blocks4={m[1]} blocks8={m[2]} blocks16={m[3]} "
          f"(cap={cap}; occupancy b8={m[0] / max(m[2] * 8, 1):.2f})",
          flush=True)

    # post-block-compaction saturation ratios on the FULL bench config
    # (textures + aniso8): demand/cap per adaptive path, max over frames —
    # >1 means a cap needs raising before bench.py's hard assert trips
    slots_used = graph.slots_used_of(buffers.materials)

    @jax.jit
    def sat_stats(consts_batch):
        def one(consts):
            out = graph.render_forward(
                scene, consts, width=width, height=height, env=env,
                textures=textures, aniso_taps=8, slots_used=slots_used,
                **base)
            return {k: v.astype(jnp.float32)
                    for k, v in out.get("saturation", {}).items()}

        def step(carry, consts_i):
            s = one(consts_i)
            if not carry:
                return s, None
            return {k: jnp.maximum(carry[k], s[k]) for k in carry}, None
        s0 = one(jax.tree_util.tree_map(lambda x: x[0], consts_batch))
        rest = jax.tree_util.tree_map(lambda x: x[1:], consts_batch)
        s, _ = jax.lax.scan(step, s0, rest)
        return s

    sat = {k: float(np.asarray(v)) for k, v in
           sat_stats(consts_batch).items()}
    print(f"saturation (demand/cap, max over {n} frames): "
          + " ".join(f"{k}={v:.3f}" for k, v in sorted(sat.items())),
          flush=True)


if __name__ == "__main__":
    main()
