"""Per-sample MSAA edge resolve tests — the counterpart of the reference's
ResolveMSAA averaging 4 shaded samples (Shaders/DepthResolve.hlsl,
SceneRendering.cpp:2060): triangle-triangle edges must blend the two
surfaces' colors by exact sample counts, not give the min-depth winner
full weight."""
import numpy as np

import jax.numpy as jnp

from vqengine_tpu.ops import msaa as msaa_ops
from vqengine_tpu.ops import raster, sparse
from vqengine_tpu.render import graph
from vqengine_tpu.render.renderer import VQRendererTPU
from vqengine_tpu.render.scene_buffers import DrawItem, build_scene_buffers
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


def _crossing_quads():
    """A red quad facing the camera and a blue quad rotated about Y so it
    pierces the red one along a vertical line near screen center."""
    red = Material(name="red")
    red.diffuse = np.asarray([0.9, 0.05, 0.05], np.float32)
    blue = Material(name="blue")
    blue.diffuse = np.asarray([0.05, 0.05, 0.9], np.float32)
    q = meshmod.quad(1.6)
    items = [
        DrawItem("red", q, m3.Transform(
            position=np.array([0, 0, 0.0], np.float32)), 0, 0),
        DrawItem("blue", q, m3.Transform(
            position=np.array([0, 0, 0.0], np.float32),
            rotation=m3.quat_from_axis_angle(
                np.array([0, 1, 0], np.float32), np.deg2rad(50.0))), 1, 1),
    ]
    return items, [red, blue]


def _scene_and_consts(items, materials):
    buffers = build_scene_buffers(items, materials)
    scene = graph.upload_scene(buffers, bucketize=False)
    consts = VQRendererTPU().build_frame_constants(
        buffers, _camera(), _lights())
    return scene, consts


class TestSparse:
    def test_compact_roundtrip(self):
        mask = jnp.zeros((8, 16), bool).at[2, 3].set(True).at[5, 7].set(True)
        idx, count, _demand = sparse.compact_indices(mask, 8)
        assert int(count) == 2
        flat = sorted(np.asarray(idx[:2]).tolist())
        assert flat == [2 * 16 + 3, 5 * 16 + 7]
        img = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)
        vals = sparse.gather_pixels(img, idx)
        assert np.asarray(vals[:2]).tolist() == [float(f) for f in flat]
        out = sparse.scatter_pixels(jnp.zeros((8, 16)), idx,
                                    jnp.ones((8,)),
                                    jnp.arange(8) < count)
        assert float(out.sum()) == 2.0
        assert bool(out[2, 3] == 1.0) and bool(out[5, 7] == 1.0)

    def test_dead_lanes_never_clobber_pixel_zero(self):
        mask = jnp.zeros((4, 4), bool).at[3, 3].set(True)
        idx, count, _demand = sparse.compact_indices(mask, 8)
        out = sparse.scatter_pixels(jnp.zeros((4, 4)), idx,
                                    jnp.full((8,), 7.0),
                                    jnp.arange(8) < count)
        assert float(out[0, 0]) == 0.0
        assert float(out[3, 3]) == 7.0


class TestPerSampleCoverage:
    def test_coverage_is_per_sample(self):
        items, mats = _crossing_quads()
        scene, consts = _scene_and_consts(items, mats)
        _, tri_id, attrs, mask, cov = graph.geometry_pass(
            scene, consts, W, H, msaa=True)
        assert cov.shape == (4, H, W)
        # interior pixels: all 4 samples covered
        cy, cx = H // 2, W // 4
        assert np.asarray(cov[:, cy, cx]).tolist() == [1.0] * 4
        # records table rides along for the edge resolve
        assert attrs["records"].shape[0] >= int(scene.num_tris_live)

    def test_interp_record_matches_kernel(self):
        """The jnp record-interpolation replica must agree with the
        kernel's in-tile resolve on winner pixels."""
        items, mats = _crossing_quads()
        scene, consts = _scene_and_consts(items, mats)
        _, tri_id, attrs, mask, _ = graph.geometry_pass(
            scene, consts, W, H, msaa=True)
        ys, xs = np.nonzero(np.asarray(mask))
        pick = slice(0, len(ys), max(1, len(ys) // 64))
        ys, xs = ys[pick], xs[pick]
        ids = jnp.asarray(np.asarray(tri_id)[ys, xs])
        rec = attrs["records"][ids]
        a = raster.interp_record_attrs(
            rec, jnp.asarray(xs, jnp.float32) + 0.5,
            jnp.asarray(ys, jnp.float32) + 0.5)
        np.testing.assert_allclose(
            np.asarray(a["uv"]), np.asarray(attrs["uv"])[ys, xs],
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(a["wnrm"]), np.asarray(attrs["wnrm"])[ys, xs],
            atol=2e-2)
        assert (np.asarray(a["item_id"])
                == np.asarray(attrs["ids"])[ys, xs, 1].astype(np.int32)).all()


class TestEdgeResolve:
    def test_secondary_found_at_intersection(self):
        items, mats = _crossing_quads()
        scene, consts = _scene_and_consts(items, mats)
        depth, tri_id, attrs, mask, cov = graph.geometry_pass(
            scene, consts, W, H, msaa=True)
        object_id = attrs["ids"][..., 0].astype(jnp.int32)
        idx, live, sec_id, n_sec, _, _ = msaa_ops.resolve_secondary(
            attrs["records"], tri_id, depth, object_id, mask, cov,
            cap=4096)
        live_np = np.asarray(live)
        assert live_np.any(), "no edge pixels resolved a secondary"
        # live pixels: secondary differs from the pixel winner and wins
        # 1..3 of the 4 samples
        own = np.asarray(sparse.gather_pixels(tri_id, idx))
        sec = np.asarray(sec_id)
        ns = np.asarray(n_sec)
        assert (sec[live_np] != own[live_np]).all()
        assert (ns[live_np] >= 1).all() and (ns[live_np] <= 3).all()

    def test_edge_pixels_blend_both_surfaces(self):
        items, mats = _crossing_quads()
        scene, consts = _scene_and_consts(items, mats)

        def render(edge):
            out = graph.render_forward(
                scene, consts, W, H, enable_shadows=False, msaa=True,
                msaa_edge_resolve=edge)
            return np.asarray(out["ldr"])

        on = render(True)
        off = render(False)
        diff = np.abs(on - off).max(axis=-1)
        assert (diff > 0.01).any(), "edge resolve changed nothing"
        # pixels the resolve touched blend red and blue: both channels
        # present, while the winner-only image is single-dominant there
        ys, xs = np.nonzero(diff > 0.02)
        blended = on[ys, xs]
        assert (blended[:, 0] > 0.02).any() and (blended[:, 2] > 0.02).any()
        # far from the intersection both renders agree exactly
        assert np.abs(on[:, : W // 8] - off[:, : W // 8]).max() < 1e-5
        assert np.abs(on[:, -W // 8:] - off[:, -W // 8:]).max() < 1e-5

    def test_neighbor_compact_matches_dense_select(self):
        """The compacted neighbor match (4 flat tri_id gathers + 1 hdr row
        gather on the [cap] lanes) must produce the SAME image as the dense
        full-frame 4-neighbor select it replaced — same candidate order,
        same first-match semantics (graph.EDGE_NEIGHBOR_COMPACT A/B)."""
        items, mats = _crossing_quads()
        scene, consts = _scene_and_consts(items, mats)

        def render():
            out = graph.render_forward(
                scene, consts, W, H, enable_shadows=False, msaa=True,
                msaa_edge_resolve="neighbor")
            return np.asarray(out["ldr"])

        prev = graph.EDGE_NEIGHBOR_COMPACT
        try:
            graph.EDGE_NEIGHBOR_COMPACT = True
            compact = render()
            graph.EDGE_NEIGHBOR_COMPACT = False
            dense = render()
        finally:
            graph.EDGE_NEIGHBOR_COMPACT = prev
        np.testing.assert_allclose(compact, dense, atol=1e-6)
