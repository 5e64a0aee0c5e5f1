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


import jax.numpy as jnp

from vqengine_tpu.ops import culling, raster


class TestGeomorph:
    """On-device continuous tessellation (the reference's adaptive HS/DS
    factors, Tessellation.hlsl): per-vertex geomorph targets + per-item
    continuous factors + the clip-transform lerp."""

    def _displaced_lods(self):
        m = meshmod.grid_exact_halving(2.0, 2.0, cells=8, num_lods=2)
        rng = np.random.default_rng(3)
        hm = rng.random((32, 32)).astype(np.float32)
        lods = [meshmod.displace(l, hm, 1.5) for l in m.lods]
        return lods

    def test_fully_morphed_equals_next_level(self):
        """The CDLOD invariant: level 0 fully morphed to its targets is
        level 1's surface exactly (even-vertex subsets coincide and odd
        vertices land on level-1 edge midpoints)."""
        l0, l1 = self._displaced_lods()
        n0 = 9
        mids = meshmod.grid_geomorph_mids(l0.positions, n0, n0)
        # even-even vertices of level 0 == level 1's vertex grid
        g0 = mids.reshape(n0, n0, 3)[::2, ::2]
        g1 = l1.positions.reshape(5, 5, 3)
        np.testing.assert_allclose(g0, g1, atol=1e-6)
        # odd-column (even-row) vertices land on level-1 horizontal edges
        odd_h = mids.reshape(n0, n0, 3)[::2, 1::2]
        expect = 0.5 * (g1[:, :-1] + g1[:, 1:])
        np.testing.assert_allclose(odd_h, expect, atol=1e-6)

    def test_morph_factor_bands(self):
        num_lods = jnp.asarray([3, 3, 3, 1])
        lod = jnp.asarray([0, 0, 1, 0])
        # areas: g = -log10(area) - 1; g=-0.5 (huge) -> m=1;
        # g=0 (switch edge of lod 0) -> m=0; g=0.8 in lod 1 -> m=0.5
        area = jnp.asarray([10.0 ** 0.5, 10.0 ** -1.0,
                            10.0 ** -1.8, 10.0 ** -1.0])
        m = np.asarray(culling.tessellation_morph_factor(
            lod, area, num_lods))
        assert m[0] == 1.0
        assert m[1] == 0.0
        np.testing.assert_allclose(m[2], 0.5, atol=1e-5)
        assert m[3] == 1.0, "coarsest level never morphs"

    def test_clip_transform_lerp(self):
        """transform_clip_corners_morph at w=0 transforms the targets, at
        w=1 the fine positions, and identity-mid meshes never move."""
        rng = np.random.default_rng(0)
        t = 4
        pos = rng.random((3 * t, 3)).astype(np.float32)
        mid = rng.random((3 * t, 3)).astype(np.float32)
        tri_item = jnp.zeros((t,), jnp.int32)
        mvp = jnp.eye(4)[None]
        for w, expect in ((1.0, pos), (0.0, mid)):
            clip = np.asarray(raster.transform_clip_corners_morph(
                jnp.asarray(pos), jnp.asarray(mid), tri_item, mvp,
                jnp.asarray([w])))
            np.testing.assert_allclose(
                clip.reshape(-1, 4)[:, :3], expect, atol=1e-5)
        clip = np.asarray(raster.transform_clip_corners_morph(
            jnp.asarray(pos), jnp.asarray(pos), tri_item, mvp,
            jnp.asarray([0.3])))
        np.testing.assert_allclose(clip.reshape(-1, 4)[:, :3], pos,
                                   atol=1e-5)

    def test_terrain_patch_carries_morph_targets(self):
        from vqengine_tpu.scene import scenes
        patch = scenes.build_terrain_patch(0, 0, patches=6, res=400,
                                           num_lods=3)
        assert patch.lods[0].morph_mid is not None
        assert patch.lods[1].morph_mid is not None
        assert patch.lods[-1].morph_mid is None, "coarsest never morphs"
        for lod in patch.lods[:-1]:
            assert lod.morph_mid.shape == lod.positions.shape
            # targets stay near the surface (within a couple of cells)
            d = np.abs(lod.morph_mid - lod.positions).max()
            assert d < 30.0
