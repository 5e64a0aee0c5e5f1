import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import ssao
from vqengine_tpu.utils import math3d as m3


def make_view_info(near=0.1, far=100.0, fov_deg=60.0, eye=(0, 2, -5)):
    return {
        "near": near, "far": far, "fov_y": np.deg2rad(fov_deg),
        "view": jnp.asarray(m3.look_at_lh(eye, (0, 0, 5))),
    }


def ndc_depth(zv, near=0.1, far=100.0):
    return (far / (far - near)) - (near * far / (far - near)) / zv


class TestViewDepth:
    def test_roundtrip(self):
        z = np.linspace(0.5, 50, 32).astype(np.float32)
        d = ndc_depth(z)
        back = np.asarray(ssao.view_depth_from_ndc(jnp.asarray(d), 0.1, 100.0))
        np.testing.assert_allclose(back, z, rtol=1e-3)

    def test_background_is_far(self):
        out = np.asarray(ssao.view_depth_from_ndc(jnp.ones((4, 4)), 0.1, 100.0))
        np.testing.assert_allclose(out, 100.0)


class TestSsao:
    def test_flat_plane_unoccluded(self):
        # a flat wall facing the camera: zero occlusion expected
        h, w = 64, 64
        depth = jnp.full((h, w), ndc_depth(10.0))
        normals = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (h, w, 3))
        info = make_view_info(eye=(0, 0, 0))
        ao = np.asarray(ssao.ssao(depth, normals, info))
        assert ao.mean() > 0.9

    def test_corner_occluded(self):
        # a step edge: pixels at the base of a depth discontinuity
        # (foreground plane meeting background) should show occlusion
        h, w = 64, 64
        zfar_v, znear_v = 10.5, 10.0  # step smaller than the AO radius
        depth = np.full((h, w), ndc_depth(zfar_v), np.float32)
        depth[:, : w // 2] = ndc_depth(znear_v)
        normals = np.tile([0, 0, -1], (h, w, 1)).astype(np.float32)
        info = make_view_info(eye=(0, 0, 0))
        ao = np.asarray(ssao.ssao(jnp.asarray(depth), jnp.asarray(normals), info,
                                  radius_world=2.0))
        # just right of the edge (background side near the step) is occluded
        edge_ao = ao[:, w // 2 + 1: w // 2 + 4].mean()
        open_ao = ao[:, -8:].mean()
        assert edge_ao < open_ao - 0.05

    def test_range_and_finite(self):
        rng = np.random.default_rng(0)
        depth = jnp.asarray(
            ndc_depth(rng.uniform(5, 20, (32, 32))).astype(np.float32))
        n = rng.normal(size=(32, 32, 3)).astype(np.float32)
        n[..., 2] = -np.abs(n[..., 2]) - 0.5
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        ao = np.asarray(ssao.ssao(depth, jnp.asarray(n), make_view_info()))
        assert np.isfinite(ao).all()
        assert (ao >= 0).all() and (ao <= 1).all()


class TestAdaptive:
    """CACAO's importance map + adaptive refinement
    (ffx_cacao_impl.cpp importance passes) as TPU compaction."""

    def _step_scene(self, h=64, w=64):
        depth = np.full((h, w), ndc_depth(10.5), np.float32)
        depth[:, : w // 2] = ndc_depth(10.0)
        normals = np.tile([0, 0, -1], (h, w, 1)).astype(np.float32)
        return jnp.asarray(depth), jnp.asarray(normals), \
            make_view_info(eye=(0, 0, 0))

    def test_importance_map_flags_contrast(self):
        flat = jnp.ones((32, 32))
        assert float(ssao.importance_map(flat).max()) == 0.0
        checker = jnp.asarray(
            (np.indices((32, 32)).sum(0) % 2).astype(np.float32))
        assert float(ssao.importance_map(checker).max()) > 0.5

    def test_adaptive_refines_toward_dense(self):
        depth, normals, info = self._step_scene()
        kw = dict(radius_world=2.0, skip_blur=True)
        base = np.asarray(ssao.ssao(depth, normals, info, num_taps=8, **kw))
        ref = np.asarray(ssao.ssao(depth, normals, info, num_taps=32, **kw))
        adapt = np.asarray(ssao.ssao(depth, normals, info, num_taps=8,
                                     adaptive_taps=8, **kw))
        assert np.isfinite(adapt).all()
        assert (adapt >= 0).all() and (adapt <= 1).all()
        # refinement ran somewhere, and only where it ran do values move
        # (the base pass is bit-identical to the non-adaptive config)
        refined = np.abs(adapt - base) > 1e-7
        assert refined.any(), "no pixel was refined"
        # flat open regions keep the base result (importance ~ 0 there)
        far_open = np.s_[8:-8, -8:]
        np.testing.assert_array_equal(adapt[far_open], base[far_open])
        # refined pixels move toward a high-tap-count reference on average
        err_base = np.abs(base[refined] - ref[refined]).mean()
        err_adapt = np.abs(adapt[refined] - ref[refined]).mean()
        assert err_adapt < err_base

    def test_upsample_bilateral_respects_depth_edges(self):
        # coarse AO: dark on the near half, bright on the far half, with a
        # matching depth edge; the upsample must not bleed dark AO across
        h, w = 16, 16
        z_c = np.full((h, w), 0.8, np.float32)
        z_c[:, : w // 2] = 0.2
        ao_c = np.where(z_c < 0.5, 0.2, 1.0).astype(np.float32)
        z_f = np.repeat(np.repeat(z_c, 2, 0), 2, 1)
        up = np.asarray(ssao.upsample_bilateral(
            jnp.asarray(ao_c), jnp.asarray(z_c), jnp.asarray(z_f)))
        assert up.shape == (2 * h, 2 * w)
        # far-side pixels adjacent to the edge stay bright
        assert up[:, w + 1] .min() > 0.95
        # near-side pixels adjacent to the edge stay dark
        assert up[:, w - 2].max() < 0.25
