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


class TestQualityLadder:
    """CACAO preset ladder (ops/ssao.PRESETS, the ffx_cacao_impl.cpp
    settings table's LOWEST..ADAPTIVE analog) validated against a
    brute-force ground-truth hemisphere integral — NOT a self-golden:
    the truth estimator samples the full-res view depth directly with
    256 spiral taps (no mip pyramid, no blur, no compaction)."""

    @staticmethod
    def _scene(h=96, w=128):
        """A step scene with contact occlusion at the edge."""
        depth = np.full((h, w), ndc_depth(10.6), np.float32)
        depth[:, : w // 2] = ndc_depth(10.0)
        # a second, vertical step for 2d structure
        depth[: h // 4] = ndc_depth(10.3)
        normals = np.tile([0, 0, -1], (h, w, 1)).astype(np.float32)
        info = make_view_info(eye=(0, 0, 0))
        return jnp.asarray(depth), jnp.asarray(normals), info

    @staticmethod
    def _truth(depth, normals, info, radius_world=2.0, num_taps=256,
               intensity=1.0):
        """Brute-force reference: same occlusion estimator family as
        ssao() (cosine-weighted, range-attenuated spiral), converged with
        many taps against the exact full-res depth — no mips, no blur."""
        h, w = depth.shape
        near, far, fov_y = info["near"], info["far"], info["fov_y"]
        view = info["view"]
        zv = np.asarray(ssao.view_depth_from_ndc(depth, near, far))
        tan_half = np.tan(fov_y * 0.5)
        aspect = w / h
        ndc_x = ((np.arange(w) + 0.5) / w * 2.0 - 1.0)[None, :]
        ndc_y = (1.0 - (np.arange(h) + 0.5) / h * 2.0)[:, None]
        pos = np.stack([ndc_x * tan_half * aspect * zv,
                        ndc_y * tan_half * zv, zv], -1)
        nv = np.einsum("ij,hwj->hwi", np.asarray(view)[:3, :3],
                       np.asarray(normals))
        r_px = np.clip(radius_world / (zv * tan_half * 2.0) * h, 2.0, 96.0)
        taps = np.asarray(ssao._spiral_taps(num_taps))
        occ = np.zeros((h, w), np.float32)
        py, px = np.mgrid[0:h, 0:w]
        for t in range(num_taps):
            sx = np.clip(px + 0.5 + taps[t, 0] * r_px, 0.5, w - 0.5)
            sy = np.clip(py + 0.5 + taps[t, 1] * r_px, 0.5, h - 0.5)
            z_t = zv[sy.astype(int), sx.astype(int)]
            s_ndc_x = (sx / w) * 2.0 - 1.0
            s_ndc_y = 1.0 - (sy / h) * 2.0
            sv = np.stack([s_ndc_x * tan_half * aspect * z_t,
                           s_ndc_y * tan_half * z_t, z_t], -1)
            d = sv - pos
            dist = np.linalg.norm(d, axis=-1)
            ddir = d / np.maximum(dist, 1e-6)[..., None]
            cos_h = (ddir * nv).sum(-1)
            fall = np.clip(1.0 - dist / radius_world, 0.0, 1.0)
            occ += np.clip(cos_h - 0.1, 0.0, 1.0) * fall
        ao = 1.0 - np.clip(occ / num_taps * 2.0 * intensity, 0.0, 1.0)
        return ao * np.sqrt(ao)

    def test_presets_monotone_and_close_to_truth(self):
        depth, normals, info = self._scene()
        truth = self._truth(depth, normals, info)
        errs = {}
        for name, (taps, extra, deint) in ssao.PRESETS.items():
            ao = np.asarray(ssao.ssao(depth, normals, info,
                                      radius_world=2.0, num_taps=taps,
                                      adaptive_taps=extra,
                                      deinterleave=deint))
            errs[name] = float(np.abs(ao - truth).mean())
        # quality must not regress up the ladder (small slack for noise)
        order = ["lowest", "low", "medium", "high", "adaptive"]
        for a, b in zip(order, order[1:]):
            assert errs[b] <= errs[a] + 0.01, (a, errs[a], b, errs[b])
        # and the top presets converge to the brute-force truth
        assert errs["high"] < 0.05, errs
        assert errs["adaptive"] < 0.04, errs

    def test_deinterleave_improves_effective_sampling(self):
        """4 phase spirals + edge-aware recombine beat the same tap
        budget with one shared spiral on a noisy-depth scene."""
        rng = np.random.default_rng(5)
        h, w = 96, 128
        zv = 10.0 + rng.uniform(0, 0.5, (h, w)).astype(np.float32)
        depth = jnp.asarray(ndc_depth(zv).astype(np.float32))
        normals = jnp.asarray(
            np.tile([0, 0, -1], (h, w, 1)).astype(np.float32))
        info = make_view_info(eye=(0, 0, 0))
        truth = self._truth(depth, normals, info)
        ao_mono = np.asarray(ssao.ssao(depth, normals, info,
                                       radius_world=2.0, num_taps=8))
        ao_deint = np.asarray(ssao.ssao(depth, normals, info,
                                        radius_world=2.0, num_taps=8,
                                        deinterleave=True))
        err_mono = float(np.abs(ao_mono - truth).mean())
        err_deint = float(np.abs(ao_deint - truth).mean())
        assert err_deint < err_mono, (err_deint, err_mono)
