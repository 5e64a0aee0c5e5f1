import numpy as np

from vqengine_tpu.scene import mesh as meshmod


def _check_lod(lod):
    assert lod.positions.dtype == np.float32
    assert lod.indices.dtype == np.int32
    assert lod.indices.min() >= 0
    assert lod.indices.max() < lod.num_vertices
    # unit normals
    n = np.linalg.norm(lod.normals, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)
    assert lod.uvs.shape == (lod.num_vertices, 2)


class TestGenerators:
    def test_triangle_matches_reference_layout(self):
        m = meshmod.triangle(1.0)
        lod = m.lods[0]
        np.testing.assert_allclose(lod.positions,
                                   [[-1, -1, 0], [0, 1, 0], [1, -1, 0]])
        np.testing.assert_allclose(lod.uvs, [[0, 1], [0.5, 0], [1, 1]])
        _check_lod(lod)

    def test_cube_bounds_and_counts(self):
        m = meshmod.cube()
        lod = m.lods[0]
        assert lod.num_vertices == 24
        assert lod.num_triangles == 12
        np.testing.assert_allclose(lod.positions.min(axis=0), [-1, -1, -1])
        np.testing.assert_allclose(lod.positions.max(axis=0), [1, 1, 1])
        _check_lod(lod)

    def test_cube_normals_outward(self):
        lod = meshmod.cube().lods[0]
        # every vertex normal should point away from the origin
        d = (lod.positions * lod.normals).sum(axis=1)
        assert (d > 0).all()

    def test_cube_winding_consistent(self):
        lod = meshmod.cube().lods[0]
        # front-face convention (matches reference cube/triangle winding):
        # geometric normal cross(e1, e2) points outward, along vertex normals.
        p = lod.positions[lod.indices]  # [T,3,3]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        geo_n = np.cross(e1, e2)
        vn = lod.normals[lod.indices[:, 0]]
        dots = (geo_n * vn).sum(axis=1)
        assert (dots > 0).all(), f"{(dots <= 0).sum()} backwards triangles"

    def test_sphere_radius_and_lods(self):
        m = meshmod.sphere(2.0, 16, 16, num_lods=3)
        assert m.num_lods == 3
        for lod in m.lods:
            r = np.linalg.norm(lod.positions, axis=1)
            np.testing.assert_allclose(r, 2.0, atol=1e-5)
            _check_lod(lod)
        assert m.lods[0].num_triangles > m.lods[1].num_triangles > m.lods[2].num_triangles

    def test_sphere_winding_outward(self):
        lod = meshmod.sphere(1.0, 12, 12).lods[0]
        p = lod.positions[lod.indices]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        geo_n = np.cross(e1, e2)
        centers = p.mean(axis=1)
        dots = (geo_n * centers).sum(axis=1)
        assert (dots > 0).all()

    def test_cylinder(self):
        m = meshmod.cylinder(3.0, 1.0, 1.0, 18, 4, num_lods=2)
        lod = m.lods[0]
        _check_lod(lod)
        assert lod.positions[:, 1].min() == -1.5
        assert lod.positions[:, 1].max() == 1.5
        rxz = np.linalg.norm(lod.positions[:, [0, 2]], axis=1)
        assert rxz.max() <= 1.0 + 1e-5

    def test_cone_base_at_zero(self):
        m = meshmod.cone(2.0, 1.0, 16)
        lod = m.lods[0]
        _check_lod(lod)
        assert abs(lod.positions[:, 1].min()) < 1e-5
        assert abs(lod.positions[:, 1].max() - 2.0) < 1e-5

    def test_grid(self):
        m = meshmod.grid(10.0, 4.0, 5, 3)
        lod = m.lods[0]
        _check_lod(lod)
        assert lod.num_vertices == 15
        assert lod.num_triangles == 2 * 4 * 2
        np.testing.assert_allclose(lod.positions[:, 1], 0.0)
        np.testing.assert_allclose(lod.normals, [[0, 1, 0]] * 15)

    def test_builtin_registry(self):
        builtins = {k: v for k, v in meshmod.BUILTIN_MESH_BUILDERS.items()
                    if k != "DetaildGrid2"}  # skip the 1200x1200 terrain grid for speed
        for name, fn in builtins.items():
            m = fn()
            assert m.num_lods >= 1
            for lod in m.lods:
                _check_lod(lod)

    def test_aabb(self):
        c, e = meshmod.cube().local_aabb()
        np.testing.assert_allclose(c, 0.0, atol=1e-6)
        np.testing.assert_allclose(e, 1.0, atol=1e-6)
