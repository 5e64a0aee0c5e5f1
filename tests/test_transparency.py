"""Alpha-mask discard + transparent-pass tests — the reference's
ForwardLighting.hlsl:237-240 cutout semantics and Model.h:45-65
opaque/transparent split."""
import numpy as np
import pytest

import jax.numpy as jnp

from vqengine_tpu.render import graph
from vqengine_tpu.render.renderer import VQRendererTPU
from vqengine_tpu.render.scene_buffers import (DrawItem, build_scene_buffers,
                                               split_transparent)
from vqengine_tpu.scene.camera import Camera, FCameraParameters
from vqengine_tpu.scene.light import ELightType, Light
from vqengine_tpu.scene.material import Material
from vqengine_tpu.scene import mesh as meshmod
from vqengine_tpu.utils import math3d as m3

W, H = 128, 96


def _camera():
    p = FCameraParameters()
    p.position = np.array([0.0, 0.0, -4.0], np.float32)
    p.fov_v_deg = 60.0
    p.near_z = 0.1
    p.far_z = 100.0
    return Camera(p, aspect=W / H)


def _lights():
    return [Light(type=ELightType.DIRECTIONAL, brightness=2.5,
                  rotation=m3.quat_from_axis_angle(
                      np.array([1.0, 0, 0], np.float32), 0.9))]


def _render(items, materials, textures=None, enable_alpha_mask=False,
            scene_transparent=None, msaa=False):
    buffers = build_scene_buffers(items, materials)
    scene = graph.upload_scene(buffers, bucketize=False)
    consts = VQRendererTPU().build_frame_constants(
        buffers, _camera(), _lights())
    out = graph.render_forward(
        scene, consts, W, H, enable_shadows=False, textures=textures,
        enable_alpha_mask=enable_alpha_mask,
        scene_transparent=scene_transparent, msaa=msaa)
    return {k: np.asarray(v) for k, v in out.items()}, buffers, consts


def _checker_texture(size=16):
    """RGBA checker: alpha alternates 1/0 in 4-texel blocks (cutout
    pattern with solid interiors, like real foliage masks — single-texel
    checkers never reach alpha<0.01 under bilinear filtering)."""
    yy, xx = np.mgrid[0:size, 0:size]
    a = ((xx // 4 + yy // 4) % 2).astype(np.float32)
    tex = np.ones((1, size, size, 4), np.float32)
    tex[0, ..., 0:3] = 0.9
    tex[0, ..., 3] = a
    # one mip level is enough for the test (constant lod 0 at this scale)
    mips = [jnp.asarray(tex)]
    s = size
    while s > 1:
        s //= 2
        small = tex[:, ::2, ::2] if s >= 1 else tex
        tex = small
        mips.append(jnp.asarray(tex))
    return tuple(mips)


class TestAlphaMask:
    def test_cutout_discards_to_background(self):
        """A quad with a checkered-alpha diffuse texture in front of a red
        floor quad: discarded texels must show the floor, not the quad."""
        cutout = Material(name="cutout")
        cutout.textures = {"diffuse": 0}
        red = Material(name="red")
        red.diffuse = np.asarray([0.9, 0.05, 0.05], np.float32)

        q = meshmod.quad(1.5)
        items = [
            DrawItem("front", q, m3.Transform(
                position=np.array([0, 0, 0], np.float32)), 0, 0),
            DrawItem("back", meshmod.quad(3.0), m3.Transform(
                position=np.array([0, 0, 2.0], np.float32)), 1, 1),
        ]
        tex = _checker_texture()
        out_masked, _, _ = _render(items, [cutout, red], textures=tex,
                                   enable_alpha_mask=True)
        out_plain, _, _ = _render(items, [cutout, red], textures=tex,
                                  enable_alpha_mask=False)
        # the object-id buffer must contain BOTH ids inside the front
        # quad's screen region when masking is on
        cy, cx = H // 2, W // 2
        region = out_masked["object_id"][cy - 10:cy + 10, cx - 10:cx + 10]
        assert (region == 0).any(), "front quad vanished entirely"
        assert (region == 1).any(), "no discarded texel revealed the floor"
        region_plain = out_plain["object_id"][cy - 10:cy + 10, cx - 10:cx + 10]
        assert (region_plain == 0).all(), "without masking the front quad covers"
        # revealed pixels show red floor
        red_px = out_masked["ldr"][cy - 10:cy + 10, cx - 10:cx + 10][
            region == 1]
        assert (red_px[:, 0] > red_px[:, 1] + 0.05).all()

    def test_all_layers_discarded_shows_sky(self):
        cutout = Material(name="cutout")
        cutout.textures = {"diffuse": 0}
        q = meshmod.quad(1.5)
        items = [DrawItem("front", q, m3.Transform(), 0, 0)]
        out, _, _ = _render(items, [cutout], textures=_checker_texture(),
                            enable_alpha_mask=True)
        cy, cx = H // 2, W // 2
        region = out["object_id"][cy - 8:cy + 8, cx - 8:cx + 8]
        assert (region == -1).any(), "fully discarded pixels must be background"


class TestTransparentPass:
    def test_split(self):
        glass = Material(name="glass")
        glass.alpha = 0.4
        solid = Material(name="solid")
        items = [
            DrawItem("a", meshmod.cube(), m3.Transform(), 0, 0),
            DrawItem("b", meshmod.cube(), m3.Transform(
                position=np.array([2, 0, 0], np.float32)), 1, 1),
        ]
        buffers = build_scene_buffers(items, [glass, solid])
        opaque, transparent = split_transparent(buffers)
        assert transparent is not None
        total = buffers.indices.shape[0]
        assert opaque.indices.shape[0] + transparent.indices.shape[0] == total
        assert (transparent.tri_item == 0).all()

    def test_no_transparent_materials(self):
        items = [DrawItem("a", meshmod.cube(), m3.Transform(), 0, 0)]
        buffers = build_scene_buffers(items, [Material(name="m")])
        opaque, transparent = split_transparent(buffers)
        assert transparent is None
        assert opaque is buffers

    def test_blend_over_opaque(self):
        """A 50%-alpha green quad in front of a red floor must blend —
        pixel is neither pure floor nor pure quad color."""
        glass = Material(name="glass")
        glass.alpha = 0.5
        glass.diffuse = np.asarray([0.05, 0.9, 0.05], np.float32)
        red = Material(name="red")
        red.diffuse = np.asarray([0.9, 0.05, 0.05], np.float32)
        items = [
            DrawItem("front", meshmod.quad(1.5), m3.Transform(), 0, 0),
            DrawItem("back", meshmod.quad(3.0), m3.Transform(
                position=np.array([0, 0, 2.0], np.float32)), 1, 1),
        ]
        buffers = build_scene_buffers(items, [glass, red])
        opaque_b, transparent_b = split_transparent(buffers)
        assert transparent_b is not None
        scene = graph.upload_scene(opaque_b, bucketize=False)
        scene_t = graph.upload_scene(transparent_b, bucketize=False)
        consts = VQRendererTPU().build_frame_constants(
            buffers, _camera(), _lights())
        out = graph.render_forward(scene, consts, W, H,
                                   enable_shadows=False,
                                   scene_transparent=scene_t)
        out_opaque_only = graph.render_forward(scene, consts, W, H,
                                               enable_shadows=False)
        ldr = np.asarray(out["ldr"])
        base = np.asarray(out_opaque_only["ldr"])
        cy, cx = H // 2, W // 2
        px = ldr[cy, cx]
        px0 = base[cy, cx]
        # blended: greener than the floor alone, but redder than opaque glass
        assert px[1] > px0[1] + 0.02, "no green contribution from the glass"
        assert px[0] > 0.05, "floor red fully lost: blend looks opaque"


class TestMSAAGbuf:
    def test_coverage_interior_and_edges(self):
        m = Material(name="m")
        items = [DrawItem("tri", meshmod.triangle(1.2), m3.Transform(), 0, 0)]
        buffers = build_scene_buffers(items, [m])
        scene = graph.upload_scene(buffers, bucketize=False)
        consts = VQRendererTPU().build_frame_constants(
            buffers, _camera(), _lights())
        depth, tri_id, attrs, mask, coverage = graph.geometry_pass(
            scene, consts, W, H, msaa=True)
        cov_s = np.asarray(coverage)
        mk = np.asarray(mask)
        assert cov_s.shape == (4, H, W)
        cov = cov_s.mean(axis=0)
        # interior pixels fully covered
        interior = mk & (np.roll(mk, 2, 0) & np.roll(mk, -2, 0)
                         & np.roll(mk, 2, 1) & np.roll(mk, -2, 1))
        assert (cov[interior] == 1.0).all()
        # some silhouette pixels partially covered
        partial = (cov > 0.0) & (cov < 1.0)
        assert partial.any(), "no fractional coverage on triangle edges"

    def test_msaa_matches_center_sampling_in_interior(self):
        m = Material(name="m")
        m.diffuse = np.asarray([0.2, 0.5, 0.8], np.float32)
        items = [DrawItem("cube", meshmod.cube(), m3.Transform(), 0, 0)]
        buffers = build_scene_buffers(items, [m])
        scene = graph.upload_scene(buffers, bucketize=False)
        consts = VQRendererTPU().build_frame_constants(
            buffers, _camera(), _lights())
        out_aa = graph.render_forward(scene, consts, W, H,
                                      enable_shadows=False, msaa=True)
        out_na = graph.render_forward(scene, consts, W, H,
                                      enable_shadows=False, msaa=False)
        a = np.asarray(out_aa["ldr"])
        b = np.asarray(out_na["ldr"])
        mask = np.asarray(out_na["object_id"]) >= 0
        interior = mask & (np.roll(mask, 2, 0) & np.roll(mask, -2, 0)
                           & np.roll(mask, 2, 1) & np.roll(mask, -2, 1))
        # interior shading identical between the two paths (the round-1
        # TPU MSAA-vs-gbuf brightness diff must not exist in this design)
        diff = np.abs(a - b)[interior]
        assert diff.max() < 2e-3, f"interior MSAA brightness diff {diff.max()}"


class TestAdaptiveTessellation:
    def test_patch_lod_changes_with_distance(self):
        import jax.numpy as jnp
        from vqengine_tpu.ops import culling
        from vqengine_tpu.scene.scenes import build_terrain_patch

        patch = build_terrain_patch(0, 0, patches=6, res=120, num_lods=3)
        assert patch.num_lods == 3
        items = [DrawItem("p", patch, m3.Transform(), 0, 0)]
        buffers = build_scene_buffers(items, [Material(name="m")])

        def lod_at(cam_pos):
            p = FCameraParameters()
            p.position = np.asarray(cam_pos, np.float32)
            p.pitch_deg = 30.0
            p.near_z, p.far_z = 0.5, 5000.0
            cam = Camera(p, aspect=1.0)
            consts = VQRendererTPU().build_frame_constants(
                buffers, cam, _lights())
            visible, lod = culling.cull_and_select_lod(
                consts.world, jnp.asarray(buffers.aabb_center),
                jnp.asarray(buffers.aabb_extent), consts.frustum_planes,
                consts.view_proj, jnp.asarray(buffers.item_num_lods))
            tri_mask = culling.triangle_mask_from_items(
                jnp.asarray(buffers.tri_item), jnp.asarray(buffers.tri_lod),
                visible, lod)
            return int(lod[0]), int(tri_mask.sum())

        near_lod, near_tris = lod_at([-450, 30, -450])
        far_lod, far_tris = lod_at([-3500, 600, -3500])
        assert near_lod < far_lod, (near_lod, far_lod)
        assert near_tris > far_tris, (near_tris, far_tris)

    def test_skirt_added(self):
        from vqengine_tpu.scene.scenes import build_terrain_patch
        patch = build_terrain_patch(1, 2, patches=6, res=120, num_lods=2)
        lod0 = patch.lods[0]
        n = int(round(np.sqrt(lod0.num_vertices)))
        assert n * n != lod0.num_vertices, "skirt ring vertices missing"
