import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import shading
from vqengine_tpu.scene.light import (ELightType, Light, pack_directional,
                                      pack_point_lights, pack_spot_extra,
                                      pack_spot_lights)
from vqengine_tpu.utils import math3d as m3


def flat_surface(n=8):
    """A small grid of upward-facing surface points on y=0."""
    xs = np.linspace(-2, 2, n, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs)
    wpos = np.stack([X, np.zeros_like(X), Z], -1)
    normal = np.tile([0, 1, 0], (n, n, 1)).astype(np.float32)
    return jnp.asarray(wpos), jnp.asarray(normal)


def shade(wpos, normal, points=None, spots=None, directional=None, ambient=0.0):
    shape = wpos.shape[:-1]
    points = points or []
    spots = spots or []
    p, _ = pack_point_lights(points, max(1, len(points)))
    s, _ = pack_spot_lights(spots, max(1, len(spots)))
    se = pack_spot_extra(spots, max(1, len(spots)))
    d = pack_directional(directional)
    return shading.shade_forward(
        world_pos=wpos, normal=normal,
        albedo=jnp.full((*shape, 3), 0.5),
        roughness=jnp.full(shape, 0.6),
        metalness=jnp.zeros(shape),
        emissive=jnp.zeros((*shape, 3)),
        ao=jnp.full(shape, ambient),
        camera_pos=jnp.asarray([0.0, 3.0, -3.0]),
        point_lights=jnp.asarray(p), spot_lights=jnp.asarray(s),
        spot_extra=jnp.asarray(se), directional=jnp.asarray(d))


class TestPointLight:
    def test_inverse_square_falloff(self):
        wpos, nrm = flat_surface()
        l = Light(type=ELightType.POINT, brightness=100.0, range=50.0)
        l.position = np.array([0, 2, 0], dtype=np.float32)
        out = np.asarray(shade(wpos, nrm, points=[l]))
        # brightest directly under the light (center), darker at edges
        c = out.shape[0] // 2
        assert out[c, c].sum() > out[0, 0].sum() * 1.5
        assert (out >= 0).all()

    def test_range_cutoff(self):
        wpos, nrm = flat_surface()
        l = Light(type=ELightType.POINT, brightness=100.0, range=0.5)
        l.position = np.array([0, 2, 0], dtype=np.float32)  # 2 > range 0.5
        out = np.asarray(shade(wpos, nrm, points=[l]))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)

    def test_padded_lights_contribute_nothing(self):
        wpos, nrm = flat_surface()
        l = Light(type=ELightType.POINT, brightness=100.0, range=50.0)
        l.position = np.array([0, 2, 0], dtype=np.float32)
        p1, _ = pack_point_lights([l], 1)
        p8, _ = pack_point_lights([l], 8)  # 7 zero rows
        kw = dict(world_pos=wpos, normal=nrm,
                  albedo=jnp.full((8, 8, 3), 0.5), roughness=jnp.full((8, 8), 0.6),
                  metalness=jnp.zeros((8, 8)), emissive=jnp.zeros((8, 8, 3)),
                  ao=jnp.zeros((8, 8)), camera_pos=jnp.asarray([0.0, 3.0, -3.0]),
                  spot_lights=jnp.zeros((1, 12)), spot_extra=jnp.zeros((1, 4)),
                  directional=jnp.zeros(12))
        a = np.asarray(shading.shade_forward(point_lights=jnp.asarray(p1), **kw))
        b = np.asarray(shading.shade_forward(point_lights=jnp.asarray(p8), **kw))
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestSpotLight:
    def test_cone_falloff(self):
        wpos, nrm = flat_surface(16)
        l = Light(type=ELightType.SPOT, brightness=100.0, range=50.0,
                  inner_cone_deg=10.0, outer_cone_deg=20.0)
        l.position = np.array([0, 4, 0], dtype=np.float32)
        # spot default +Z; rotate 90 deg about X to look down (-Y)
        l.rotation = m3.quat_from_axis_angle((1, 0, 0), np.pi / 2)
        d = l.direction()
        np.testing.assert_allclose(d, [0, -1, 0], atol=1e-6)
        out = np.asarray(shade(wpos, nrm, spots=[l]))
        c = out.shape[0] // 2
        # lit inside the cone footprint (r = 4*tan(20deg) ~ 1.45)
        assert out[c, c].sum() > 0.01
        # dark outside the cone (corner at r ~ 2.8)
        assert out[0, 0].sum() < 1e-5

    def test_inner_cone_full_intensity(self):
        l = Light(type=ELightType.SPOT, inner_cone_deg=10.0, outer_cone_deg=30.0)
        lpos = jnp.asarray([0.0, 4.0, 0.0])
        sdir = jnp.asarray([0.0, -1.0, 0.0])
        inner = np.deg2rad(10.0)
        outer = np.deg2rad(30.0)
        inten_center = shading._spot_intensity(sdir, outer, inner, lpos,
                                               jnp.asarray([[0.0, 0.0, 0.0]]))
        assert float(inten_center[0]) == 1.0
        # halfway between cones ~ 0.5
        r = 4 * np.tan(np.deg2rad(20.0))
        inten_mid = shading._spot_intensity(sdir, outer, inner, lpos,
                                            jnp.asarray([[r, 0.0, 0.0]]))
        assert 0.3 < float(inten_mid[0]) < 0.7
        del l


class TestDirectional:
    def test_lambert_cosine(self):
        wpos, nrm = flat_surface()
        l = Light(type=ELightType.DIRECTIONAL, brightness=1.0)
        # straight down
        out_down = np.asarray(shade(wpos, nrm, directional=l))
        # 60 deg slant: rotate direction by 60deg about X
        l2 = Light(type=ELightType.DIRECTIONAL, brightness=1.0)
        l2.rotation = m3.quat_from_axis_angle((1, 0, 0), np.deg2rad(60.0))
        out_slant = np.asarray(shade(wpos, nrm, directional=l2))
        # diffuse part scales with NdotL: slant should be dimmer overall
        assert out_slant.mean() < out_down.mean()
        ratio = out_slant.mean() / out_down.mean()
        assert 0.3 < ratio < 0.75  # cos(60) = 0.5 plus specular variation

    def test_disabled_light_is_black(self):
        wpos, nrm = flat_surface()
        l = Light(type=ELightType.DIRECTIONAL, brightness=5.0, enabled=False)
        packed = pack_directional(l)
        assert packed[9] == 0.0
        out = np.asarray(shade(wpos, nrm, directional=None))
        np.testing.assert_allclose(out, 0.0, atol=1e-7)


class TestAmbientEmissive:
    def test_ambient_floor(self):
        wpos, nrm = flat_surface()
        out = np.asarray(shade(wpos, nrm, ambient=0.055))
        np.testing.assert_allclose(out, 0.5 * 0.055, atol=1e-6)
