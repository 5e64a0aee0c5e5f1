import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import ssr
from vqengine_tpu.utils import math3d as m3


def ndc_depth(zv, near=0.1, far=100.0):
    return (far / (far - near)) - (near * far / (far - near)) / zv


def floor_and_wall_scene(h=64, w=64, fov=60.0):
    """Camera at origin looking +Z: a floor (y=-1) in the lower half and a
    bright emissive wall at z=20 visible in the upper half."""
    near, far = 0.1, 100.0
    fov_y = np.deg2rad(fov)
    tan_half = np.tan(fov_y / 2)
    aspect = w / h
    ndc_y = 1.0 - (np.arange(h) + 0.5) / h * 2.0
    ndc_x = (np.arange(w) + 0.5) / w * 2.0 - 1.0
    NY, NX = np.meshgrid(ndc_y, ndc_x, indexing="ij")

    # floor: y = -1 -> view depth z = -(-1)/ (NY*tan) for NY<0
    z_floor = np.where(NY < -0.02, 1.0 / np.maximum(-NY * tan_half, 1e-3), np.inf)
    z_wall = np.full((h, w), 20.0)
    zv = np.minimum(z_floor, z_wall).astype(np.float32)
    depth = ndc_depth(zv, near, far).astype(np.float32)

    is_floor = z_floor < z_wall
    normals = np.where(is_floor[..., None],
                       np.array([0, 1, 0], np.float32),
                       np.array([0, 0, -1], np.float32)).astype(np.float32)
    color = np.where(is_floor[..., None],
                     np.array([0.1, 0.1, 0.1], np.float32),
                     np.array([5.0, 0.2, 0.2], np.float32)).astype(np.float32)
    info = jnp.asarray([near, far, fov_y, aspect], jnp.float32)
    view = jnp.asarray(m3.look_at_lh((0, 0, 0), (0, 0, 10)))
    return (jnp.asarray(color), jnp.asarray(depth), jnp.asarray(normals),
            view, info, is_floor)


class TestTrace:
    def test_floor_reflects_wall(self):
        color, depth, normals, view, info, is_floor = floor_and_wall_scene()
        refl, conf = ssr.trace_reflections(color, depth, normals, view, info)
        refl, conf = np.asarray(refl), np.asarray(conf)
        assert np.isfinite(refl).all() and np.isfinite(conf).all()
        assert (conf >= 0).all() and (conf <= 1).all()
        # floor pixels that found a hit should reflect the red wall
        hit_floor = is_floor & (conf > 0.5)
        assert hit_floor.sum() > 50, f"too few hits: {hit_floor.sum()}"
        assert refl[hit_floor][:, 0].mean() > 1.0  # red dominated

    def test_wall_pixels_low_confidence(self):
        # wall normals face the camera; reflections point back at the camera
        color, depth, normals, view, info, is_floor = floor_and_wall_scene()
        refl, conf = ssr.trace_reflections(color, depth, normals, view, info)
        conf = np.asarray(conf)
        assert conf[~is_floor].mean() < 0.2


class TestDenoise:
    @staticmethod
    def _hist(rgb, depth=None, n=8.0):
        """7-channel history: rgb | depth | lum mu | lum m2 | sample n.
        Moments are seeded consistent with a steady signal at `rgb`."""
        h, w = rgb.shape[:2]
        if depth is None:
            depth = jnp.zeros((h, w))
        lum = (rgb * jnp.asarray([0.299, 0.587, 0.114])).sum(-1)
        return jnp.concatenate(
            [rgb, depth[..., None], lum[..., None], (lum ** 2)[..., None],
             jnp.full((h, w, 1), n)], axis=-1)

    def test_temporal_blend(self):
        """In-distribution history blends by alpha; new_history carries the
        resolve depth + temporal moments + sample count."""
        refl = jnp.full((32, 32, 3), 0.5)
        conf = jnp.ones((32, 32))
        rough = jnp.zeros((32, 32))
        hist = self._hist(jnp.full((32, 32, 3), 0.5))
        out, new_hist = ssr.denoise_reflections(refl, conf, rough, hist,
                                                temporal_alpha=0.75)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)
        assert new_hist.shape == (32, 32, ssr.HISTORY_CHANNELS)

    def test_zero_history_bootstraps_clean(self):
        """The zero init (init_history) carries sample count 0: the first
        frame must pass the current signal through untouched."""
        refl = jnp.full((16, 16, 3), 0.3)
        out, new_hist = ssr.denoise_reflections(
            refl, jnp.ones((16, 16)), jnp.zeros((16, 16)),
            ssr.init_history(16, 16), temporal_alpha=0.9)
        np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-5)
        assert float(new_hist[..., 6].min()) >= 1.0

    def test_ghost_history_clamped(self):
        """Stale history far outside the local color bounds must be clamped
        to the current neighborhood (DNSR variance clamping) — no ghosting."""
        refl = jnp.full((32, 32, 3), 0.2)
        hist = self._hist(jnp.full((32, 32, 3), 10.0))
        out, _ = ssr.denoise_reflections(refl, jnp.ones((32, 32)),
                                         jnp.zeros((32, 32)), hist,
                                         temporal_alpha=0.75)
        np.testing.assert_allclose(np.asarray(out), 0.2, atol=1e-4)

    def test_variance_clamp_kills_inbounds_ghost(self):
        """A ghost INSIDE the spatial min/max bounds (a bright spec pixel
        widens them) but outside the history's own tracked luminance
        distribution is still suppressed by the temporal variance clamp —
        the case the spatial clamp alone cannot catch."""
        cur = np.full((16, 16, 3), 0.2, np.float32)
        cur[8, 8] = 5.0          # bright speck widens local minmax bounds
        refl = jnp.asarray(cur)
        # history: steady 0.2 everywhere (tight tracked variance), but a
        # 3.0 ghost blob near the speck — inside [0.2, 5.0] spatial bounds
        hrgb = np.full((16, 16, 3), 0.2, np.float32)
        hrgb[7:10, 7:10] = 3.0
        hist_np = np.asarray(self._hist(jnp.asarray(np.full(
            (16, 16, 3), 0.2, np.float32)))).copy()
        hist_np[..., :3] = hrgb
        out, _ = ssr.denoise_reflections(
            jnp.asarray(refl), jnp.ones((16, 16)), jnp.zeros((16, 16)),
            jnp.asarray(hist_np), temporal_alpha=0.9)
        out = np.asarray(out)
        # neighbors of the speck: ghost luminance ~3 vs tracked mu 0.2,
        # sigma ~0 -> clamped to ~mu; output stays near 0.2
        assert out[7, 7].max() < 0.5, out[7, 7]
        assert out[9, 9].max() < 0.5, out[9, 9]

    def test_sample_count_ramps_trust(self):
        """A 1-frame-old history moves the output far less than a
        32-frame one (sample-count-ramped accumulation), and the count
        accumulates across resolves."""
        yy, xx = np.mgrid[0:8, 0:8]
        base = np.where(((xx + yy) % 2) == 0, 0.1, 0.3).astype(np.float32)
        refl = jnp.asarray(np.repeat(base[..., None], 3, axis=-1))
        hist_rgb = jnp.full((8, 8, 3), 0.25)
        d = jnp.full((8, 8), 0.9)
        kw = dict(temporal_alpha=0.9, depth=d)
        out_young, nh = ssr.denoise_reflections(
            refl, jnp.ones((8, 8)), jnp.zeros((8, 8)),
            self._hist(hist_rgb, d, n=1.0), **kw)
        out_old, _ = ssr.denoise_reflections(
            refl, jnp.ones((8, 8)), jnp.zeros((8, 8)),
            self._hist(hist_rgb, d, n=32.0), **kw)
        pull_young = float(np.abs(np.asarray(out_young) - np.asarray(refl)).mean())
        pull_old = float(np.abs(np.asarray(out_old) - np.asarray(refl)).mean())
        assert pull_old > pull_young * 1.5, (pull_young, pull_old)
        # count accumulated everywhere (the consistency test may trim
        # the increment on pixels whose luminance jumped)
        assert float(nh[..., 6].min()) > 1.0
        assert float(nh[..., 6].max()) == 2.0

    def test_disocclusion_drops_history(self):
        """A depth mismatch between history and current collapses the
        temporal weight AND resets the accumulated sample count."""
        # checkerboard current field so the local color bounds [0.1, 0.3]
        # leave room for the 0.25 history (a constant field would clamp it)
        yy, xx = np.mgrid[0:8, 0:8]
        base = np.where(((xx + yy) % 2) == 0, 0.1, 0.3).astype(np.float32)
        refl = jnp.asarray(np.repeat(base[..., None], 3, axis=-1))
        hist_rgb = jnp.full((8, 8, 3), 0.25)
        depth_now = jnp.full((8, 8), 0.9)
        hist_same = self._hist(hist_rgb, depth_now)
        hist_disocc = self._hist(hist_rgb, jnp.full((8, 8), 0.2))
        out_same, _ = ssr.denoise_reflections(
            refl, jnp.ones((8, 8)), jnp.zeros((8, 8)), hist_same,
            temporal_alpha=0.75, depth=depth_now)
        out_disocc, nh = ssr.denoise_reflections(
            refl, jnp.ones((8, 8)), jnp.zeros((8, 8)), hist_disocc,
            temporal_alpha=0.75, depth=depth_now)
        # with matching depth the blend pulls toward history
        assert float(np.abs(np.asarray(out_same) - np.asarray(refl)).max()) > 0.05
        # with mismatched depth, history is rejected
        np.testing.assert_allclose(np.asarray(out_disocc), np.asarray(refl),
                                   atol=1e-5)
        # and the accumulation restarts from scratch
        np.testing.assert_allclose(np.asarray(nh[..., 6]), 1.0, atol=1e-5)

    def test_moving_ghost_sequence(self):
        """VERDICT r3 #8 scenario: a camera pans across a static bright
        region; naive constant-alpha blending smears the bright history
        into newly revealed dark pixels for many frames, the
        variance-clamped sample-ramped resolve does not."""
        w = 32
        dark = np.full((8, w, 3), 0.1, np.float32)
        bright = dark.copy()
        bright[:, :16] = 1.0
        d = jnp.full((8, w), 0.5)
        hist = ssr.init_history(8, w)
        # 6 frames staring at the bright-left scene
        for _ in range(6):
            _, hist = ssr.denoise_reflections(
                jnp.asarray(bright), jnp.ones((8, w)), jnp.zeros((8, w)),
                hist, temporal_alpha=0.9, depth=d)
        # pan: the bright half scrolls out; motion says "history for
        # column x sits at x+8" — columns 8..15 now show dark surface
        # whose reprojected history is the BRIGHT region (same depth:
        # the disocclusion test cannot save these pixels)
        panned = dark.copy()
        panned[:, :8] = 1.0
        motion = np.zeros((8, w, 2), np.float32)
        motion[..., 0] = -8.0 / (w * 0.5)    # prev px = curr + 8
        out, _ = ssr.denoise_reflections(
            jnp.asarray(panned), jnp.ones((8, w)), jnp.zeros((8, w)),
            hist, motion=jnp.asarray(motion), temporal_alpha=0.9, depth=d)
        out = np.asarray(out)
        # columns 10..14: current 0.1, reprojected history 1.0 at matching
        # depth — the spatial minmax clamp (bounds include nothing bright
        # locally) + variance clamp must keep them dark
        assert out[:, 10:14].max() < 0.2, out[:, 10:14].max()


    def test_rough_pixels_blurred(self):
        img = np.zeros((32, 32, 3), np.float32)
        img[16, 16] = 10.0
        rough_smooth = jnp.zeros((32, 32))
        rough_rough = jnp.full((32, 32), 0.9)
        out_s, _ = ssr.denoise_reflections(jnp.asarray(img), jnp.ones((32, 32)),
                                           rough_smooth)
        out_r, _ = ssr.denoise_reflections(jnp.asarray(img), jnp.ones((32, 32)),
                                           rough_rough)
        assert float(np.asarray(out_s).max()) > float(np.asarray(out_r).max())


class TestComposite:
    def test_smooth_metal_gets_reflection(self):
        scene = jnp.full((8, 8, 3), 0.1)
        refl = jnp.full((8, 8, 3), 2.0)
        conf = jnp.ones((8, 8))
        out_metal = np.asarray(ssr.apply_reflections(
            scene, refl, conf, jnp.full((8, 8), 0.05), jnp.ones((8, 8)),
            jnp.full((8, 8, 3), 0.9), jnp.broadcast_to(jnp.asarray([0., 1., 0.]), (8, 8, 3)),
            jnp.broadcast_to(jnp.asarray([0., 1., 0.]), (8, 8, 3))))
        out_rough = np.asarray(ssr.apply_reflections(
            scene, refl, conf, jnp.full((8, 8), 0.95), jnp.zeros((8, 8)),
            jnp.full((8, 8, 3), 0.9), jnp.broadcast_to(jnp.asarray([0., 1., 0.]), (8, 8, 3)),
            jnp.broadcast_to(jnp.asarray([0., 1., 0.]), (8, 8, 3))))
        assert out_metal.mean() > out_rough.mean() + 0.5


class TestRayCompaction:
    """SSSR's ClassifyTiles + indirect dispatch as TPU compaction: the
    compacted march must reproduce the dense march exactly on every ray
    it classifies as active, and only skip rays whose composite weight is
    zero anyway."""

    def test_compacted_matches_dense_on_active(self):
        color, depth, normals, view, info, is_floor = floor_and_wall_scene()
        dense_r, dense_c = ssr.trace_reflections(color, depth, normals,
                                                 view, info)
        comp_r, comp_c = ssr.trace_reflections(color, depth, normals,
                                               view, info, ray_frac=2)
        dense_c, comp_c = np.asarray(dense_c), np.asarray(comp_c)
        dense_r, comp_r = np.asarray(dense_r), np.asarray(comp_r)
        active = comp_c > 0
        assert active.any()
        np.testing.assert_allclose(comp_c[active], dense_c[active],
                                   atol=1e-6)
        np.testing.assert_allclose(comp_r[active], dense_r[active],
                                   atol=1e-6)
        # skipped rays: either dense also found nothing, or the ray faces
        # the camera / is background (composite weight would be ~0)
        skipped_but_dense_hit = (~active) & (dense_c > 1e-3)
        assert not skipped_but_dense_hit.any(), (
            f"{skipped_but_dense_hit.sum()} contributing rays were skipped")

    def test_ray_weight_prunes(self):
        color, depth, normals, view, info, is_floor = floor_and_wall_scene()
        # weight 0 on the top half: those rays must not march
        wgt = jnp.asarray(np.where(np.arange(64)[:, None] < 32, 0.0,
                                   1.0) * np.ones((64, 64)),
                          jnp.float32)
        r, c = ssr.trace_reflections(color, depth, normals, view, info,
                                     ray_frac=2, ray_weight=wgt)
        c = np.asarray(c)
        assert (c[:32] == 0).all()
        assert (c[32:] > 0).any()
