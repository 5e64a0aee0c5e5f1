"""Split the multichip dryrun cost into trace/lower vs XLA-compile vs
execute (one-off diagnostic for the driver-timeout issue). CPU-only."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    import functools

    import numpy as np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as ge
    from vqengine_tpu.parallel import multichip
    from vqengine_tpu.render import graph

    # reuse the dryrun's exact setup by monkey-stealing its body up to the
    # render call: replicate the small scene build here
    t0 = time.perf_counter()
    # build via dryrun internals (duplicated minimal version)
    import jax.numpy as jnp
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.render.scene_buffers import DrawItem, build_scene_buffers
    from vqengine_tpu.scene.camera import Camera, FCameraParameters
    from vqengine_tpu.scene.light import ELightType, Light
    from vqengine_tpu.scene.material import Material
    from vqengine_tpu.scene import mesh as meshmod
    from vqengine_tpu.utils import math3d as m3
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.ops.texture import pack_texture_quads
    from vqengine_tpu.scene.texture_manager import checkerboard, generate_mips

    devices = jax.devices()[:8]
    mesh = multichip.make_mesh(devices, dp=2, sp=4)
    width, height = 64, 64

    items = [
        DrawItem("cube", meshmod.cube(), m3.Transform(), 0, 0),
        DrawItem("sphere", meshmod.sphere(0.8, 8, 8),
                 m3.Transform(position=np.array([2.0, 0, 0], np.float32)),
                 0, 1),
    ]
    mat = Material(name="m")
    mat.textures = {"diffuse": 0}
    buffers = build_scene_buffers(items, [mat])
    scene = graph.upload_scene(buffers, bucketize=False)
    slots_used = graph.slots_used_of(buffers.materials)
    mips = generate_mips(checkerboard(8, 4))
    textures = pack_texture_quads([m[None] for m in mips])
    env = graph.build_environment(procedural_sky_equirect(32, 16),
                                  diffuse_size=8, specular_base=16,
                                  specular_mips=3, lut_size=32)
    lights = [
        Light(type=ELightType.DIRECTIONAL, brightness=1.0,
              casts_shadows=True, viewport_x=16, viewport_y=16,
              shadow_far=50.0),
        Light(type=ELightType.SPOT, brightness=30.0, range=50.0,
              position=np.array([0, 4, -2], np.float32),
              casts_shadows=True, shadow_far=60.0),
        Light(type=ELightType.POINT, brightness=30.0, range=50.0,
              position=np.array([-3, 3, -2], np.float32),
              casts_shadows=True, shadow_near=0.2, shadow_far=60.0),
    ]
    consts_list = []
    r = VQRendererTPU()
    for i in range(2):
        p = FCameraParameters()
        p.position = np.array([0.5 * i, 1.5, -5], np.float32)
        cam = Camera(p, aspect=width / height)
        consts_list.append(r.build_frame_constants(buffers, cam, lights))
    batch = multichip.stack_frame_constants(consts_list)
    shadow_maps = jax.jit(functools.partial(
        graph.render_shadow_maps, shadow_dims=(32, 32, 32)))(
            scene, consts_list[0])
    print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)

    sp = 4
    band_height = height // sp
    kwargs = dict(env=env, shadow_maps=shadow_maps, textures=textures,
                  slots_used=slots_used, msaa=True,
                  enable_ssao=True, enable_ssr=True, ssao_halo=4)

    def shard_fn(scene, consts, env, shadow_maps, textures):
        kw = dict(kwargs)
        kw.update(env=env, shadow_maps=shadow_maps, textures=textures)

        def per_frame(consts):
            return multichip._render_band(scene, consts, width, height,
                                          band_height, sp, **kw)
        return jax.vmap(per_frame)(consts)

    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
    specs_consts = jax.tree_util.tree_map(lambda _: P("dp"), batch)
    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep(scene), specs_consts, rep(env), rep(shadow_maps),
                  rep(textures)),
        out_specs=(P("dp", "sp", None, None), P("dp", "sp", None)),
        check_vma=False,
    ))
    t0 = time.perf_counter()
    lowered = fn.lower(scene, batch, env, shadow_maps, textures)
    print(f"trace+lower {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"xla-compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ldr, depth = compiled(scene, batch, env, shadow_maps, textures)
    out = np.asarray(ldr)
    print(f"execute {time.perf_counter()-t0:.1f}s mean={out.mean():.4f}",
          flush=True)


if __name__ == "__main__":
    main()
