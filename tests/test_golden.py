"""Golden-frame regression tests: render fixed configs and compare against
checked-in goldens with SSIM (the reference's visual smoke-test discipline,
SURVEY.md §4, made quantitative). Regenerate with
`python tests/test_golden.py --regen` after intentional visual changes."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
SSIM_THRESHOLD = 0.985


def _render_textured_quad() -> np.ndarray:
    """Graph-level textured golden: checkerboard diffuse + bump normal on
    a floor quad and sphere, quad-packed RGBA8 sampling + aniso taps."""
    import jax
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.ops.texture import pack_texture_quads
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.render.scene_buffers import (DrawItem,
                                                   build_scene_buffers)
    from vqengine_tpu.scene.camera import Camera, FCameraParameters
    from vqengine_tpu.scene.light import ELightType, Light
    from vqengine_tpu.scene.material import Material
    from vqengine_tpu.scene.texture_manager import (brick, checkerboard,
                                                    generate_mips,
                                                    noise_texture,
                                                    normal_from_height)
    from vqengine_tpu.scene import mesh as meshmod
    from vqengine_tpu.utils import math3d as m3

    mats = [Material(name="floor"), Material(name="ball")]
    mats[0].textures = {"diffuse": 0, "normal": 2, "roughness": 3}
    mats[0].uv_scale = np.asarray([4.0, 4.0], np.float32)
    mats[1].textures = {"diffuse": 1}
    mats[1].roughness = 0.3
    items = [
        DrawItem("floor", meshmod.quad(8.0),
                 m3.Transform(rotation=m3.quat_from_euler_xyz_degrees(90, 0, 0)),
                 0, 0),
        DrawItem("ball", meshmod.sphere(1.0, 24, 24),
                 m3.Transform(position=np.array([0, 1.0, 0], np.float32)),
                 0, 1),
    ]
    buffers = build_scene_buffers(items, mats)
    scene = graph.upload_scene(buffers)
    slots_used = graph.slots_used_of(buffers.materials)
    per_tex = [generate_mips(t) for t in
               (checkerboard(64, 8), brick(64), normal_from_height(
                   noise_texture(64, seed=3), 1.5),
                noise_texture(64, base=0.55, amp=0.35))]
    textures = pack_texture_quads(
        [np.stack([m[l] for m in per_tex]) for l in range(len(per_tex[0]))])
    env = graph.build_environment(procedural_sky_equirect(128, 64),
                                  diffuse_size=16, specular_base=32,
                                  specular_mips=4, lut_size=64)
    p = FCameraParameters()
    p.position = np.array([0, 2.0, -5.0], np.float32)
    p.pitch_deg = 12.0
    cam = Camera(p, aspect=192 / 108)
    lights = [Light(type=ELightType.DIRECTIONAL, brightness=1.5,
                    rotation=m3.quat_from_euler_xyz_degrees(50, 0, 20))]
    consts = VQRendererTPU().build_frame_constants(buffers, cam, lights)
    out = graph.render_forward(scene, consts, 192, 108, env=env,
                               textures=textures, slots_used=slots_used,
                               aniso_taps=2, enable_shadows=False)
    return np.asarray(out["ldr"])


def _render_gltf_roundtrip() -> np.ndarray:
    """A real .glb through the real loader (VERDICT r4 #6): export a
    3-material still life with gltf_export, load via gltf.load_gltf_meshes
    (accessor decode, node-walk, RH->LH conversion), render textured."""
    import tempfile
    from pathlib import Path

    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.render.scene_buffers import (DrawItem,
                                                   build_scene_buffers)
    from vqengine_tpu.scene.camera import Camera, FCameraParameters
    from vqengine_tpu.scene.gltf import load_gltf_meshes
    from vqengine_tpu.scene.gltf_export import export_glb
    from vqengine_tpu.scene.light import ELightType, Light
    from vqengine_tpu.scene.material import Material
    from vqengine_tpu.scene import mesh as meshmod
    from vqengine_tpu.scene.texture_manager import TextureManager, brick
    from vqengine_tpu.utils import math3d as m3

    def mat(name, dif, rough, metal):
        m = Material(name=name)
        m.diffuse = np.asarray(dif, np.float32)
        m.roughness = rough
        m.metalness = metal
        return m

    mats = [mat("floor", (0.5, 0.45, 0.4), 0.8, 0.0),
            mat("ball", (0.8, 0.3, 0.2), 0.25, 0.0),
            mat("pillar", (0.7, 0.65, 0.3), 0.4, 1.0)]
    objs = [
        ("floor", meshmod.quad(4.0).lods[0],
         m3.Transform(rotation=m3.quat_from_euler_xyz_degrees(90, 0, 0))
         .matrix(), mats[0]),
        ("ball", meshmod.sphere(0.8, 16, 16).lods[0],
         m3.Transform(position=np.array([-0.9, 0.8, 0], np.float32))
         .matrix(), mats[1]),
        ("pillar", meshmod.cylinder(2.0, 0.4, 0.4).lods[0],
         m3.Transform(position=np.array([1.0, 1.0, 0.5], np.float32))
         .matrix(), mats[2]),
    ]
    glb = Path(tempfile.gettempdir()) / "vqe_golden_roundtrip.glb"
    export_glb(objs, glb)
    loaded = load_gltf_meshes(glb)
    assert len(loaded) == 3

    tm = TextureManager(size=64)
    b_id = tm.create_from_array("brick", brick(64))
    items = []
    mats_l = []
    for i, (mesh, m) in enumerate(loaded):
        assert m is not None
        m.textures = {"diffuse": b_id}
        mats_l.append(m)
        items.append(DrawItem(mesh.name, mesh, m3.Transform(), i, i))
    textures = tm.build_device_arrays_packed()
    buffers = build_scene_buffers(items, mats_l)
    scene = graph.upload_scene(buffers, bucketize=False)
    slots_used = graph.slots_used_of(buffers.materials)
    env = graph.build_environment(procedural_sky_equirect(128, 64),
                                  diffuse_size=16, specular_base=32,
                                  specular_mips=4, lut_size=64)
    p = FCameraParameters()
    p.position = np.array([0, 2.0, -5.0], np.float32)
    p.pitch_deg = 12.0
    cam = Camera(p, aspect=192 / 108)
    lights = [Light(type=ELightType.DIRECTIONAL, brightness=1.5,
                    rotation=m3.quat_from_euler_xyz_degrees(50, 0, 20))]
    consts = VQRendererTPU().build_frame_constants(buffers, cam, lights)
    out = graph.render_forward(scene, consts, 192, 108, env=env,
                               textures=textures, slots_used=slots_used,
                               aniso_taps=2, enable_shadows=False)
    return np.asarray(out["ldr"])


def render_config(name: str) -> np.ndarray:
    from vqengine_tpu.engine.cli import parse_command_line
    from vqengine_tpu.engine.engine import VQEngineTPU

    if name == "textured_quad":
        return _render_textured_quad()
    if name == "gltf_roundtrip":
        return _render_gltf_roundtrip()

    cfgs = {
        "hello_triangle": ("HelloTriangle", dict(ssao=False, msaa=False, ssr=False)),
        "hello_cube": ("HelloCube", dict(ssao=False, msaa=False, ssr=False)),
        "hello_cube_msaa": ("HelloCube", dict(ssao=False, msaa=True, ssr=False)),
        "default_scene": ("Default", dict(ssao=False, msaa=False, ssr=False,
                                          shadow_dims=(64, 64, 64))),
        "default_ssao": ("Default", dict(ssao=True, msaa=False, ssr=False,
                                         shadow_dims=(64, 64, 64))),
        "default_ssr": ("Default", dict(ssao=False, msaa=False, ssr=True,
                                        shadow_dims=(64, 64, 64))),
        "default_hdr10": ("Default", dict(ssao=False, msaa=False, ssr=False,
                                          shadow_dims=(64, 64, 64),
                                          hdr10=True)),
        # full-res 5x5 PCF spot/dir + 20-tap omni point (the reference's
        # default shadow look, Lighting.hlsl:89-272) as a pinned config
        "default_pcf": ("Default", dict(ssao=False, msaa=False, ssr=False,
                                        shadow_dims=(128, 64, 128),
                                        shadow_filter="pcf")),
        "sponza": ("Sponza", dict(ssao=False, msaa=False, ssr=False,
                                  shadow_dims=(128, 64, 256))),
        "terrain": ("Terrain", dict(ssao=False, msaa=False, ssr=False,
                                    shadow_dims=(64, 64, 128))),
        "envmap_unit_test": ("EnvironmentMapUnitTest",
                             dict(ssao=False, msaa=False, ssr=False)),
    }
    scene, opts = cfgs[name]
    e = VQEngineTPU(startup=parse_command_line(
        [f"-W=192", f"-H=108", f"-Scene={scene}"]))
    e.gfx.bAmbientOcclusion = opts.get("ssao", False)
    e.gfx.bAntiAliasing = opts.get("msaa", False)
    e.gfx.Reflections = 1 if opts.get("ssr", False) else 0
    e.gfx.bDrawLightBounds = True
    # scenes ship in-repo (Data/Levels); an unresolvable scene is a bug,
    # not a skip (VERDICT r2 #8 — the silent-skip path hid missing data)
    assert e.start_loading_scene(scene), f"scene {scene} failed to load"
    cam = e.cameras[0]
    consts = e.renderer.build_frame_constants(e.scene_buffers, cam, e.lights)
    out = e.renderer.render(consts, 192, 108, env=e.environment,
                            enable_ssao=e.gfx.bAmbientOcclusion,
                            msaa=e.gfx.bAntiAliasing,
                            enable_ssr=bool(e.gfx.Reflections),
                            textures=e.texture_arrays,
                            hdr10=opts.get("hdr10", False),
                            shadow_dims=opts.get("shadow_dims"),
                            shadow_filter=opts.get("shadow_filter", "esm"))
    return np.asarray(out.ldr)


# core lane: one config per major feature axis (raster, MSAA, shadows,
# SSAO, SSR, textures, stress scene). The rest are variations that share
# those code paths and run in the --runslow lane (the host has one CPU
# core; each engine-level config compiles its own graph).
CORE_CONFIGS = ["hello_triangle", "hello_cube_msaa", "default_ssao",
                "default_ssr", "sponza", "textured_quad",
                "gltf_roundtrip"]
EXTENDED_CONFIGS = ["hello_cube", "default_scene", "default_hdr10",
                    "default_pcf", "terrain", "envmap_unit_test"]
CONFIGS = CORE_CONFIGS + EXTENDED_CONFIGS


@pytest.mark.parametrize(
    "name",
    CORE_CONFIGS + [pytest.param(n, marks=pytest.mark.slow)
                    for n in EXTENDED_CONFIGS])
def test_golden(name):
    from vqengine_tpu.utils.image_io import read_png
    from vqengine_tpu.utils.ssim import ssim

    golden_path = GOLDEN_DIR / f"{name}.png"
    if not golden_path.is_file():
        pytest.skip(f"golden {name} not generated yet (run --regen)")
    img = render_config(name)
    golden = read_png(golden_path).astype(np.float32)[:, :, :3] / 255.0
    score = ssim(img, golden)
    assert score >= SSIM_THRESHOLD, f"{name}: SSIM {score:.4f} < {SSIM_THRESHOLD}"
    # localized damage global SSIM can absorb (a vanished object, one
    # corrupted tile) must also fail: bound the worst 16x16 block's mean
    # error and the global mean (PNG quantization noise floor ~0.004)
    err = np.abs(img - golden).mean(axis=-1)
    h, w = err.shape
    hb, wb = h // 16 * 16, w // 16 * 16
    blocks = err[:hb, :wb].reshape(hb // 16, 16, wb // 16, 16).mean((1, 3))
    assert err.mean() < 0.01, f"{name}: global MAE {err.mean():.4f}"
    assert blocks.max() < 0.08, (
        f"{name}: worst 16x16 block MAE {blocks.max():.4f} "
        f"at {np.unravel_index(blocks.argmax(), blocks.shape)}")


def regen():
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vqengine_tpu.utils.image_io import write_png
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name in CONFIGS:
        img = render_config(name)
        write_png(GOLDEN_DIR / f"{name}.png", img)
        print(f"wrote golden {name}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        regen()
