import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import brdf as B
from vqengine_tpu.ops import colorspace as cs


class TestMicrofacet:
    def test_ndf_ggx_normalization_trend(self):
        # smoother surface -> higher, tighter peak at NdotH=1
        assert float(B.ndf_ggx(jnp.asarray(1.0), jnp.asarray(0.1))) > \
               float(B.ndf_ggx(jnp.asarray(1.0), jnp.asarray(0.9)))
        # rough surface spreads energy to grazing angles
        assert float(B.ndf_ggx(jnp.asarray(0.5), jnp.asarray(0.9))) > \
               float(B.ndf_ggx(jnp.asarray(0.5), jnp.asarray(0.1)))

    def test_ndf_ggx_analytic(self):
        # NDF(ndoth, r) = a^2 / (pi * (nh^2 (a^2-1) + 1)^2), a = r^2
        r, nh = 0.5, 0.8
        a2 = (r * r) ** 2
        expected = a2 / (np.pi * (nh * nh * (a2 - 1) + 1) ** 2)
        got = float(B.ndf_ggx(jnp.asarray(nh), jnp.asarray(r)))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_geometry_range(self):
        n = jnp.asarray([0.0, 0.0, 1.0])
        for ang in (0.0, 30.0, 60.0, 85.0):
            v = jnp.asarray([np.sin(np.deg2rad(ang)), 0, np.cos(np.deg2rad(ang))])
            for r in (0.05, 0.5, 0.95):
                g = float(B.geometry_smith_schlick_ggx(n, v, jnp.asarray(r)))
                assert 0.0 <= g <= 1.0 + 1e-5

    def test_fresnel_schlick_limits(self):
        n = jnp.asarray([0.0, 0.0, 1.0])
        f0 = jnp.asarray([0.04, 0.04, 0.04])
        # normal incidence -> F0
        f = B.fresnel_schlick(n, n, f0)
        np.testing.assert_allclose(np.asarray(f), 0.04, atol=1e-6)
        # grazing -> 1
        v = jnp.asarray([1.0, 0.0, 0.0])
        f = B.fresnel_schlick(n, v, f0)
        np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-6)


class TestBRDF:
    def test_energy_reasonable_and_reciprocal_shape(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        albedo = jnp.asarray([[0.8, 0.8, 0.8]])
        wi = B.normalize(jnp.asarray([[0.3, 0.2, 1.0]]))
        v = B.normalize(jnp.asarray([[-0.4, 0.1, 1.0]]))
        fr = B.brdf(n, albedo, jnp.asarray([0.5]), jnp.asarray([0.0]), wi, v)
        assert fr.shape == (1, 3)
        assert (np.asarray(fr) >= 0).all()
        # dielectric diffuse floor is ~ kd*albedo/pi
        assert np.asarray(fr).max() < 10.0

    def test_metal_has_no_diffuse(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        albedo = jnp.asarray([[1.0, 0.0, 0.0]])
        wi = B.normalize(jnp.asarray([[0.5, 0.0, 1.0]]))
        # view far from mirror direction -> metal reflects almost nothing
        v = B.normalize(jnp.asarray([[-0.9, 0.0, 0.3]]))
        fr_metal = B.brdf(n, albedo, jnp.asarray([0.2]), jnp.asarray([1.0]), wi, v)
        fr_diel = B.brdf(n, albedo, jnp.asarray([0.2]), jnp.asarray([0.0]), wi, v)
        assert float(fr_metal.sum()) < float(fr_diel.sum())

    def test_hammersley_low_discrepancy(self):
        i = jnp.arange(64, dtype=jnp.uint32)
        xi = np.asarray(B.hammersley(i, 64))
        assert xi.shape == (64, 2)
        assert xi.min() >= 0 and xi.max() < 1
        # van der Corput: first elements 0, 1/2, 1/4, 3/4...
        np.testing.assert_allclose(xi[:4, 1], [0, 0.5, 0.25, 0.75], atol=1e-7)

    def test_importance_sample_ggx_around_normal(self):
        n = jnp.asarray([0.0, 0.0, 1.0])
        i = jnp.arange(256, dtype=jnp.uint32)
        xi = B.hammersley(i, 256)
        h = np.asarray(B.importance_sample_ggx(
            xi, jnp.broadcast_to(n, (256, 3)), jnp.asarray(0.1)))
        # low roughness: samples tightly around the normal
        assert h[:, 2].mean() > 0.95
        h_rough = np.asarray(B.importance_sample_ggx(
            xi, jnp.broadcast_to(n, (256, 3)), jnp.asarray(0.9)))
        assert h_rough[:, 2].mean() < h[:, 2].mean()

    def test_brdf_lut_shape_and_range(self):
        lut = np.asarray(B.brdf_integration_lut(size=32, num_samples=64))
        assert lut.shape == (32, 32, 2)
        assert lut.min() >= 0.0
        assert lut.max() <= 1.5
        # scale term: smooth surface at normal incidence integrates near 1
        assert lut[0, -1, 0] > 0.9  # row 0 = low roughness? (y=roughness)


class TestColorspace:
    def test_srgb_roundtrip(self):
        x = jnp.asarray(np.linspace(0, 1, 64, dtype=np.float32))
        y = cs.srgb_to_linear(cs.linear_to_srgb(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_srgb_anchor_points(self):
        assert float(cs.linear_to_srgb(jnp.asarray(0.0))) == 0.0
        assert float(cs.linear_to_srgb(jnp.asarray(1.0))) == pytest.approx(1.0, abs=1e-5)
        # 18% grey -> ~0.46
        assert float(cs.linear_to_srgb(jnp.asarray(0.18))) == pytest.approx(0.4613, abs=1e-3)

    def test_rec709_2020_roundtrip(self):
        c = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 3)).astype(np.float32))
        back = cs.rec2020_to_rec709(cs.rec709_to_rec2020(c))
        np.testing.assert_allclose(np.asarray(back), np.asarray(c), atol=2e-3)

    def test_st2084_monotone(self):
        x = jnp.asarray(np.linspace(0, 1, 32, dtype=np.float32))
        y = np.asarray(cs.linear_to_st2084(x))
        assert (np.diff(y) >= 0).all()
        assert y[-1] == pytest.approx(1.0, abs=1e-4)
