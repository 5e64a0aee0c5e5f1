import numpy as np

from vqengine_tpu.scene import mesh as meshmod


class TestSubdivision:
    def test_1_to_4(self):
        cube = meshmod.cube().lods[0]
        s = meshmod.subdivide(cube, 1)
        assert s.num_triangles == cube.num_triangles * 4
        # surface preserved: subdivided verts stay on the cube's faces
        assert np.abs(s.positions).max() <= 1.0 + 1e-6

    def test_winding_preserved(self):
        sph = meshmod.sphere(1.0, 8, 8).lods[0]
        s = meshmod.subdivide(sph, 1)
        p = s.positions[s.indices]
        geo = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        centers = p.mean(axis=1)
        assert ((geo * centers).sum(1) > -1e-7).all()

    def test_shared_edges_deduplicated(self):
        g = meshmod.grid(1.0, 1.0, 3, 3).lods[0]  # 8 tris, shared edges
        s = meshmod.subdivide(g, 1)
        # naive per-tri midpoints would add 3 verts/tri = 24; dedup gives
        # the true edge count (16 interior+boundary edges)
        added = s.num_vertices - g.num_vertices
        assert added == 16

    def test_displacement(self):
        g = meshmod.grid(2.0, 2.0, 8, 8).lods[0]
        hm = np.ones((16, 16), np.float32) * 0.5
        d = meshmod.displace(g, hm, 2.0)
        np.testing.assert_allclose(d.positions[:, 1], 1.0, atol=1e-5)
        # uv/topology untouched
        np.testing.assert_array_equal(d.indices, g.indices)
