import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import ffx
from vqengine_tpu.ops import postprocess as pp
from vqengine_tpu.ops import colorspace as cs


def checker(h=32, w=32, period=8):
    y, x = np.mgrid[0:h, 0:w]
    v = (((y // period) + (x // period)) % 2).astype(np.float32)
    return np.stack([v, v, v], -1)


class TestCas:
    def test_flat_image_unchanged(self):
        img = jnp.full((16, 16, 3), 0.5)
        out = np.asarray(ffx.cas(img, 0.5))
        np.testing.assert_allclose(out, 0.5, atol=1e-5)

    def test_sharpening_increases_contrast(self):
        img = jnp.asarray(checker() * 0.5 + 0.25)
        blurred = pp.gaussian_blur(img, radius=2, sigma=1.0)
        out = np.asarray(ffx.cas(blurred, 1.0))
        assert out.std() > np.asarray(blurred).std()
        assert np.isfinite(out).all()


class TestRcas:
    def test_flat_unchanged(self):
        img = jnp.full((16, 16, 3), 0.25)
        out = np.asarray(ffx.rcas(img))
        np.testing.assert_allclose(out, 0.25, atol=1e-5)

    def test_sharpens(self):
        img = jnp.asarray(checker() * 0.6 + 0.2)
        blurred = pp.gaussian_blur(img, radius=2, sigma=1.2)
        out = np.asarray(ffx.rcas(blurred, sharpness_stops=0.0))
        assert out.std() > np.asarray(blurred).std() * 1.01


class TestEasu:
    def test_identity_scale_close_to_source(self):
        # smooth gradient image (the lanczos lobes ring on pure noise)
        y, x = np.mgrid[0:24, 0:24].astype(np.float32) / 24
        img = jnp.asarray(np.stack([x, y, 0.5 * (x + y)], -1))
        out = np.asarray(ffx.easu(img, 24, 24))
        assert np.abs(out - np.asarray(img)).mean() < 0.02

    def test_upscale_shape_and_range(self):
        img = jnp.asarray(checker(20, 20, 5))
        out = np.asarray(ffx.easu(img, 40, 40))
        assert out.shape == (40, 40, 3)
        assert out.min() >= -1e-4 and out.max() <= 1 + 1e-4  # deringing clamp

    def test_edges_stay_sharper_than_bilinear(self):
        # vertical edge upscaled 2x: EASU's edge adaptation should produce
        # fewer intermediate values than bilinear
        img = np.zeros((16, 16, 3), np.float32)
        img[:, 8:] = 1.0
        out = np.asarray(ffx.easu(jnp.asarray(img), 32, 32))
        mid_fraction = ((out[:, :, 0] > 0.2) & (out[:, :, 0] < 0.8)).mean()
        assert mid_fraction < 0.2

    def test_fsr1_pipeline(self):
        img = jnp.asarray(checker(16, 16, 4) * 0.8)
        out = np.asarray(ffx.fsr1(img, 32, 32))
        assert out.shape == (32, 32, 3)
        assert np.isfinite(out).all()


class TestSpd:
    def test_mip_chain_sizes(self):
        img = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (64, 128)))
        mips = ffx.spd_mip_pyramid(img)
        sizes = [m.shape for m in mips]
        assert sizes[0] == (64, 128) and sizes[1] == (32, 64)
        assert sizes[-1][0] == 1
        # mean preserved
        assert float(mips[-1].mean()) == pytest.approx(float(img.mean()), rel=1e-4)

    def test_min_reduce_for_depth(self):
        img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (16, 16)))
        mips = ffx.spd_mip_pyramid(img, reduce="min")
        assert float(mips[-1][0, 0]) == pytest.approx(float(img.min()))

    def test_color_mips(self):
        img = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (32, 32, 3)))
        mips = ffx.spd_mip_pyramid(img, num_mips=4)
        assert len(mips) == 4 and mips[-1].shape == (4, 4, 3)
