import numpy as np
import pytest

from vqengine_tpu.utils import math3d as m3


def project(mat, v3):
    v = np.array([*v3, 1.0], dtype=np.float32)
    c = mat @ v
    return c[:3] / c[3]


class TestPerspective:
    def test_near_far_map_to_0_1(self):
        p = m3.perspective_lh(np.deg2rad(70.0), 16 / 9, 0.1, 1000.0)
        near_pt = project(p, (0, 0, 0.1))
        far_pt = project(p, (0, 0, 1000.0))
        assert near_pt[2] == pytest.approx(0.0, abs=1e-5)
        assert far_pt[2] == pytest.approx(1.0, abs=1e-5)

    def test_fov_edges(self):
        fovy = np.deg2rad(90.0)
        p = m3.perspective_lh(fovy, 1.0, 0.1, 100.0)
        # at z=d, the frustum's top edge is y=d for 90-degree vertical fov
        top = project(p, (0, 10.0, 10.0))
        assert top[1] == pytest.approx(1.0, abs=1e-5)

    def test_w_is_view_z(self):
        p = m3.perspective_lh(np.deg2rad(60.0), 1.0, 0.5, 50.0)
        clip = p @ np.array([1, 2, 7, 1], dtype=np.float32)
        assert clip[3] == pytest.approx(7.0)


class TestLookAt:
    def test_eye_maps_to_origin(self):
        v = m3.look_at_lh((1, 2, 3), (4, 5, 6))
        out = v @ np.array([1, 2, 3, 1], dtype=np.float32)
        np.testing.assert_allclose(out[:3], 0.0, atol=1e-6)

    def test_forward_is_positive_z(self):
        v = m3.look_at_lh((0, 0, 0), (0, 0, 10))
        out = v @ np.array([0, 0, 5, 1], dtype=np.float32)
        np.testing.assert_allclose(out[:3], [0, 0, 5], atol=1e-6)

    def test_left_handed_x(self):
        # looking down +Z with +Y up, +X world should be +X view (LH)
        v = m3.look_at_lh((0, 0, 0), (0, 0, 1))
        out = v @ np.array([1, 0, 0, 1], dtype=np.float32)
        assert out[0] == pytest.approx(1.0)


class TestQuaternion:
    def test_axis_angle_rotate(self):
        q = m3.quat_from_axis_angle((0, 1, 0), np.pi / 2)
        v = m3.quat_rotate(q, (1, 0, 0))
        # LH convention with standard quat math: +X rotates to -Z around +Y
        np.testing.assert_allclose(v, [0, 0, -1], atol=1e-6)

    def test_matrix_matches_rotate(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            axis = rng.normal(size=3)
            angle = rng.uniform(-np.pi, np.pi)
            q = m3.quat_from_axis_angle(axis, angle)
            v = rng.normal(size=3).astype(np.float32)
            via_q = m3.quat_rotate(q, v)
            via_m = (m3.quat_to_matrix(q)[:3, :3] @ v).astype(np.float32)
            np.testing.assert_allclose(via_q, via_m, atol=1e-5)

    def test_euler_order_global_xyz(self):
        # X then Y: rotating (0,0,1) by 90deg about X gives (0,-1,0);
        # then 90deg about Y leaves (0,-1,0) unchanged.
        q = m3.quat_from_euler_xyz_degrees(90, 90, 0)
        v = m3.quat_rotate(q, (0, 0, 1))
        np.testing.assert_allclose(v, [0, -1, 0], atol=1e-6)


class TestTransform:
    def test_srt_order(self):
        t = m3.Transform(
            position=np.array([10, 0, 0], dtype=np.float32),
            rotation=m3.quat_from_axis_angle((0, 1, 0), np.pi / 2),
            scale=np.array([2, 2, 2], dtype=np.float32),
        )
        # scale first (1,0,0)->(2,0,0), rotate -> (0,0,-2), translate -> (10,0,-2)
        out = t.matrix() @ np.array([1, 0, 0, 1], dtype=np.float32)
        np.testing.assert_allclose(out[:3], [10, 0, -2], atol=1e-5)

    def test_normal_matrix_nonuniform_scale(self):
        t = m3.Transform(scale=np.array([1, 2, 1], dtype=np.float32))
        n = t.normal_matrix()[:3, :3] @ np.array([0, 1, 0], dtype=np.float32)
        n = n / np.linalg.norm(n)
        np.testing.assert_allclose(n, [0, 1, 0], atol=1e-6)


class TestFrustum:
    def test_points_inside_outside(self):
        p = m3.perspective_lh(np.deg2rad(90.0), 1.0, 0.1, 100.0)
        v = m3.look_at_lh((0, 0, 0), (0, 0, 1))
        planes = m3.frustum_planes_from_viewproj(p @ v)

        def inside(pt):
            d = planes[:, :3] @ np.asarray(pt, dtype=np.float32) + planes[:, 3]
            return bool((d >= 0).all())

        assert inside((0, 0, 50))
        assert inside((40, 40, 50))       # within 90deg cone
        assert not inside((0, 0, -5))     # behind camera
        assert not inside((0, 0, 150))    # beyond far
        assert not inside((100, 0, 50))   # outside right plane

    def test_aabb_transform(self):
        c, e = m3.aabb_transform(
            np.zeros(3, dtype=np.float32),
            np.ones(3, dtype=np.float32),
            m3.Transform(position=np.array([5, 0, 0], dtype=np.float32),
                         rotation=m3.quat_from_axis_angle((0, 0, 1), np.pi / 4)).matrix(),
        )
        np.testing.assert_allclose(c, [5, 0, 0], atol=1e-6)
        s2 = np.sqrt(2.0)
        np.testing.assert_allclose(e, [s2, s2, 1], atol=1e-5)
