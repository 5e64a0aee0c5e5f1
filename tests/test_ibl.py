import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import brdf as B
from vqengine_tpu.ops import ibl


class TestMappings:
    def test_equirect_uv_roundtrip(self):
        dirs, omega = ibl.equirect_texel_directions(64, 32)
        uv = np.asarray(ibl.direction_to_equirect_uv(jnp.asarray(dirs)))
        us = (np.arange(64) + 0.5) / 64
        vs = (np.arange(32) + 0.5) / 32
        U, V = np.meshgrid(us, vs)
        np.testing.assert_allclose(uv[:, 0], U.reshape(-1), atol=1e-5)
        np.testing.assert_allclose(uv[:, 1], V.reshape(-1), atol=1e-5)

    def test_solid_angles_sum_to_sphere(self):
        _, omega = ibl.equirect_texel_directions(128, 64)
        assert omega.sum() == pytest.approx(4 * np.pi, rel=1e-3)

    def test_cube_dirs_roundtrip_through_face_uv(self):
        from vqengine_tpu.ops.shadow import _cube_face_uv
        size = 16
        d = ibl.cube_texel_directions(size)
        face, uv = _cube_face_uv(jnp.asarray(d.reshape(-1, 3)))
        face = np.asarray(face).reshape(6, size, size)
        uv = np.asarray(uv).reshape(6, size, size, 2)
        for f in range(6):
            assert (face[f] == f).all(), f"face {f} misassigned"
        # uv should hit the texel centers
        t = (np.arange(size) + 0.5) / size
        for f in range(6):
            np.testing.assert_allclose(
                uv[f, :, :, 0], np.broadcast_to(t[None, :], (size, size)), atol=1e-5)
            np.testing.assert_allclose(
                uv[f, :, :, 1], np.broadcast_to(t[:, None], (size, size)), atol=1e-5)

    def test_cube_sample_identity(self):
        # sampling a cubemap at its own texel directions returns the texels
        rng = np.random.default_rng(0)
        cube = jnp.asarray(rng.uniform(0, 1, (6, 8, 8, 3)).astype(np.float32))
        dirs = jnp.asarray(ibl.cube_texel_directions(8))
        out = np.asarray(ibl.sample_cube(cube, dirs, bilinear=False))
        np.testing.assert_allclose(out, np.asarray(cube), atol=1e-6)


class TestConvolutions:
    def test_constant_environment(self):
        # constant radiance L everywhere: irradiance = L (cosine integral = pi)
        env = jnp.full((32, 64, 3), 2.0)
        irr = np.asarray(ibl.diffuse_irradiance_cube(env, size=8, source_width=32))
        np.testing.assert_allclose(irr, 2.0, rtol=0.02)

    def test_single_bright_texel_cosine_lobe(self):
        # light from +Y only: irradiance at N=+Y should exceed N=+X ~ 0
        env = np.zeros((32, 64, 3), np.float32)
        env[0:2, :, :] = 100.0  # top rows = +Y direction
        irr = np.asarray(ibl.diffuse_irradiance_cube(
            jnp.asarray(env), size=8, source_width=64))
        up_face = irr[2]    # +Y face
        down_face = irr[3]  # -Y face
        assert up_face.mean() > 10 * max(down_face.mean(), 1e-6)

    def test_specular_mips_get_blurrier(self):
        rng = np.random.default_rng(1)
        env = jnp.asarray(rng.uniform(0, 4, (64, 128, 3)).astype(np.float32))
        mips = ibl.specular_prefilter_mips(env, base_size=32, num_mips=4,
                                           source_width=64)
        assert len(mips) == 4
        # variance decreases with roughness
        variances = [float(jnp.var(m)) for m in mips]
        assert variances[1] > variances[2] > variances[3]
        # energy approximately preserved
        means = [float(m.mean()) for m in mips]
        for m in means[1:]:
            assert m == pytest.approx(means[1], rel=0.2)

    def test_mirror_mip_matches_env(self):
        env = jnp.asarray(ibl.procedural_sky_equirect(128, 64))
        mips = ibl.specular_prefilter_mips(env, base_size=16, num_mips=3,
                                           source_width=64)
        direct = ibl.equirect_to_cubemap(env, 16)
        np.testing.assert_allclose(np.asarray(mips[0]), np.asarray(direct),
                                   atol=1e-5)


class TestEnvironmentIllumination:
    def test_rough_metal_reflects_env_color(self):
        env = jnp.full((32, 64, 3), 1.0) * jnp.asarray([4.0, 0.0, 0.0])
        diff = ibl.diffuse_irradiance_cube(env, size=8, source_width=32)
        mips = ibl.specular_prefilter_mips(env, base_size=16, num_mips=3,
                                           source_width=32)
        lut = B.brdf_integration_lut(size=16, num_samples=32)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        v = jnp.asarray([[0.0, 1.0, 0.0]])
        out = np.asarray(ibl.environment_illumination(
            n, v, jnp.asarray([0.5]), jnp.asarray([1.0]),
            jnp.asarray([[1.0, 1.0, 1.0]]), diff, mips, lut))
        assert out[0, 0] > 10 * max(out[0, 2], 1e-6)  # red env -> red reflection

    def test_sky_radiance_directional(self):
        env = np.zeros((32, 64, 3), np.float32)
        env[0:4] = 10.0  # bright top
        up = np.asarray(ibl.sky_radiance(jnp.asarray([[0.0, 1.0, 0.0]]),
                                         jnp.asarray(env)))
        fwd = np.asarray(ibl.sky_radiance(jnp.asarray([[1.0, 0.0, 0.0]]),
                                          jnp.asarray(env)))
        assert up[0, 0] > 5.0 and fwd[0, 0] < 1.0


class TestProceduralSky:
    def test_sun_and_gradient(self):
        sky = ibl.procedural_sky_equirect(128, 64)
        assert sky.shape == (64, 128, 3)
        assert np.isfinite(sky).all() and (sky >= 0).all()
        # sun disc creates a strong max; sky brighter above horizon
        assert sky.max() > 10.0
        top = sky[:16].mean()
        bottom = sky[-16:].mean()
        assert top > bottom


class TestSH9Irradiance:
    def test_matches_cosine_convolution(self):
        """SH9 irradiance is the l<=2 band-limit of the dense cosine
        matmul — for a smooth sky they agree within a few percent."""
        rng = np.random.default_rng(3)
        env = jnp.asarray(
            ibl.procedural_sky_equirect(64, 32, sun_intensity=5.0))
        cube = ibl.diffuse_irradiance_cube(env, size=8, source_width=64)
        coeffs = ibl.sh9_irradiance_coeffs(env, source_width=64)
        dirs = rng.normal(size=(64, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        sh = np.asarray(ibl.sh9_eval(jnp.asarray(dirs), coeffs))
        ref = np.asarray(ibl.sample_cube(cube, jnp.asarray(dirs)))
        scale = ref.mean()
        assert scale > 0
        np.testing.assert_allclose(sh, ref, atol=0.12 * scale, rtol=0.25)

    def test_constant_env_exact(self):
        """A constant environment has only the l=0 band: SH9 is exact."""
        env = jnp.full((16, 32, 3), 2.0)
        coeffs = ibl.sh9_irradiance_coeffs(env, source_width=32)
        d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        out = np.asarray(ibl.sh9_eval(d, coeffs))
        np.testing.assert_allclose(out, 2.0, rtol=0.02)


class TestBrdfPoly:
    """The Chebyshev surface fit of OUR split-sum LUT must stay within
    SSIM-safe error of the table it replaces (the per-pixel LUT gather)."""

    def test_fit_error_vs_lut(self):
        from vqengine_tpu.ops import ibl
        lut = ibl.brdf_lut_cached(64, num_samples=128)
        coeffs = jnp.asarray(ibl.brdf_poly_fit(np.asarray(lut)))
        g = (np.arange(64) + 0.5) / 64
        nv, r = np.meshgrid(g, g, indexing="xy")
        fit = np.asarray(ibl.brdf_poly_eval(
            coeffs, jnp.asarray(nv, jnp.float32), jnp.asarray(r, jnp.float32)))
        err = np.abs(fit - np.asarray(lut))
        # the 128-sample test LUT's own Monte Carlo noise bounds the
        # achievable fit (~2.5e-4 mean at degree 20); production fits the
        # 512-sample LUT
        assert err.max() < 8e-3, err.max()
        assert err.mean() < 5e-4, err.mean()
