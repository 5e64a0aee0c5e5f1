import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import raster, shadow
from vqengine_tpu.scene.light import ELightType, Light, cubemap_view_matrix
from vqengine_tpu.scene import mesh as meshmod
from vqengine_tpu.utils import math3d as m3


def scene_occluder_and_ground():
    """A small quad floating above a big ground plane."""
    cube = meshmod.cube().lods[0]
    ground = meshmod.grid(20.0, 20.0, 2, 2).lods[0]
    v = cube.positions.shape[0]
    pos = np.concatenate([cube.positions * [1.5, 0.1, 1.5] + [0, 3, 0],
                          ground.positions])
    idx = np.concatenate([cube.indices, ground.indices + v]).astype(np.int32)
    iov = np.zeros(pos.shape[0], np.int32)
    world = np.eye(4, dtype=np.float32)[None]
    return (jnp.asarray(pos.astype(np.float32)), jnp.asarray(iov),
            jnp.asarray(world), jnp.asarray(idx))


class TestShadowDepthRender:
    def test_directional_map_contains_occluder(self):
        pos, iov, world, idx = scene_occluder_and_ground()
        l = Light(type=ELightType.DIRECTIONAL, casts_shadows=True,
                  viewport_x=16, viewport_y=16, distance_from_origin=50,
                  shadow_near=0.1, shadow_far=100)
        dmap = np.asarray(shadow.render_shadow_depth(
            pos, iov, world, jnp.asarray(l.view_projection()), idx, 128))
        assert dmap.shape == (128, 128)
        # 16-unit viewport inside the 20-unit ground: map fully covered
        assert (dmap < 1.0).mean() > 0.95
        c = dmap[64, 64]
        e = dmap[8, 8]
        assert c < e  # occluder depth < ground depth


class TestPcf:
    def test_shadowed_vs_lit(self):
        pos, iov, world, idx = scene_occluder_and_ground()
        l = Light(type=ELightType.DIRECTIONAL, casts_shadows=True,
                  viewport_x=32, viewport_y=32, distance_from_origin=50,
                  shadow_near=0.1, shadow_far=100, depth_bias=0.002)
        vp = jnp.asarray(l.view_projection())
        dmap = shadow.render_shadow_depth(pos, iov, world, vp, idx, 256)

        # sample points on the ground: under the occluder vs far away
        test_pts = jnp.asarray([[0.0, 0.0, 0.0],    # under occluder
                                [8.0, 0.0, 8.0]])   # open ground
        ndotl = jnp.asarray([1.0, 1.0])
        vis = np.asarray(shadow.shadow_test_pcf(
            test_pts, ndotl, vp, dmap, l.depth_bias, slope_scaled=False))
        assert vis[0] < 0.2, f"under occluder should be shadowed, vis={vis[0]}"
        assert vis[1] > 0.8, f"open ground should be lit, vis={vis[1]}"

    def test_out_of_frustum_unlit(self):
        # reference ShadowTestPCF returns 0 outside the light frustum
        dmap = jnp.ones((64, 64))
        vp = jnp.asarray(m3.orthographic_lh(4, 4, 0.1, 10)
                         @ m3.look_at_lh((0, 5, 0), (0, 0, 0), (0, 0, 1)))
        pts = jnp.asarray([[100.0, 0.0, 100.0]])
        vis = np.asarray(shadow.shadow_test_pcf(
            pts, jnp.asarray([1.0]), vp, dmap, 0.001))
        assert vis[0] == 0.0


class TestCubeFaceMapping:
    def test_face_centers(self):
        dirs = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
        face, uv = shadow._cube_face_uv(jnp.asarray(dirs))
        np.testing.assert_array_equal(np.asarray(face), [0, 1, 2, 3, 4, 5])
        np.testing.assert_allclose(np.asarray(uv), 0.5, atol=1e-6)

    def test_uv_matches_render_convention(self):
        # render a point at a known world position into face 0 (+X),
        # then check _cube_face_uv maps its direction to the same texel
        lpos = np.zeros(3, np.float32)
        target = np.array([4.0, 1.0, 0.5], np.float32)
        view = cubemap_view_matrix(0, lpos)
        proj = m3.perspective_lh(np.pi / 2, 1.0, 0.1, 100.0)
        clip = (proj @ view) @ np.array([*target, 1.0])
        ndc = clip[:3] / clip[3]
        expected_uv = np.array([0.5 + 0.5 * ndc[0], 0.5 - 0.5 * ndc[1]])
        face, uv = shadow._cube_face_uv(jnp.asarray(target - lpos))
        assert int(face) == 0
        np.testing.assert_allclose(np.asarray(uv), expected_uv, atol=1e-5)


class TestRadialConversion:
    def test_center_texel_axis_distance(self):
        # flat plane at view distance d in front of a 90deg face:
        # center texel radial == d / far
        near, far, d = 0.1, 50.0, 7.0
        z_ndc = (far / (far - near)) - (near * far / (far - near)) / d
        depth = jnp.full((64, 64), z_ndc)
        radial = np.asarray(shadow.ndc_depth_to_radial(depth, near, far))
        center = radial[32, 32]
        assert center == pytest.approx(d / far, rel=1e-3)
        # corners see the plane at larger radial distance
        assert radial[0, 0] > center
        np.testing.assert_allclose(radial[0, 0] / center,
                                   np.sqrt(1 + 2 * (31.5 / 32) ** 2), rtol=0.05)


class TestEsmVsPcfError:
    """Quantify the visibility error of the production ESM path (blurred
    exponential map, pooled to half/quarter resolution like
    graph.render_shadow_maps) against full-resolution 5x5 PCF ground
    truth (Lighting.hlsl:177-272) — the number that justifies ESM as the
    default shadow filter."""

    def test_pooled_esm_visibility_error_bounded(self):
        pos, iov, world, idx = scene_occluder_and_ground()
        l = Light(type=ELightType.DIRECTIONAL, casts_shadows=True,
                  viewport_x=16, viewport_y=16, distance_from_origin=50,
                  shadow_near=0.1, shadow_far=100, depth_bias=0.003)
        vp = jnp.asarray(l.view_projection())
        dmap = shadow.render_shadow_depth(pos, iov, world, vp, idx, 512)

        # receivers: a grid of ground points spanning lit, shadowed, and
        # penumbra regions under the floating occluder
        g = np.linspace(-6.0, 6.0, 49, dtype=np.float32)
        gx, gz = np.meshgrid(g, g)
        wpos = jnp.asarray(
            np.stack([gx, np.zeros_like(gx), gz], axis=-1))
        ndotl = jnp.ones(wpos.shape[:2], jnp.float32)

        pcf = np.asarray(shadow.shadow_test_pcf(
            wpos, ndotl, vp, dmap, l.depth_bias, slope_scaled=False))
        # production config: prefilter + pool x1 (spot/dir budget,
        # graph.render_shadow_maps: 1024->512 etc.)
        esm_map = shadow.prefilter_esm(dmap, pool=1)
        esm = np.asarray(shadow.shadow_test_esm(
            wpos, vp, esm_map, l.depth_bias))

        err = np.abs(esm - pcf)
        # hard shadow/lit regions must agree nearly exactly; the blurred
        # penumbra band may disagree (ESM is softer by design), so the
        # MEAN error stays small while the max may approach 1 on the
        # penumbra's edge pixels. Measured with ESM_TEST_SHARPNESS = 2:
        # mean 0.005, lit 0.0, shadowed 0.011 (was 0.106 unsharpened),
        # label agreement 99.96%.
        assert err.mean() < 0.01, f"mean |ESM-PCF| = {err.mean():.4f}"
        lit = pcf > 0.95
        shadowed = pcf < 0.05
        assert err[lit].mean() < 0.005
        assert err[shadowed].mean() < 0.03
        agree = ((esm > 0.5) == (pcf > 0.5)).mean()
        assert agree > 0.99, f"hard-label agreement {agree:.3f}"
