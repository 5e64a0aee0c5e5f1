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


class TestPatchPipeline:
    """Quad-patch tessellation (ops/tessellation.py) — the HS/DS
    counterpart (Tessellation.hlsl:1-675): fractional-odd continuity,
    crack-free shared edges, per-patch frustum cull, and factor-1
    equality with the untessellated control mesh."""

    def test_frac_odd_endpoints_and_uniform_top(self):
        from vqengine_tpu.ops import tessellation as tess
        m = tess.MAX_SEGS
        u = jnp.asarray(np.arange(m + 1) / m, jnp.float32)
        # factor 1: everything snaps to the endpoints
        p1 = np.asarray(tess.frac_odd_snap(u, jnp.asarray(1.0)))
        assert set(np.unique(p1)) <= {0.0, 1.0}
        # factor == max: exactly the uniform template
        pm = np.asarray(tess.frac_odd_snap(u, jnp.asarray(float(m))))
        np.testing.assert_allclose(pm, np.arange(m + 1) / m, atol=1e-6)

    def test_frac_odd_continuous_in_factor(self):
        from vqengine_tpu.ops import tessellation as tess
        m = tess.MAX_SEGS
        u = jnp.asarray(np.arange(m + 1) / m, jnp.float32)
        fs = np.linspace(1.0, float(m), 121)
        prev = None
        for f in fs:
            p = np.asarray(tess.frac_odd_snap(u, jnp.asarray(f)))
            assert (np.diff(p) >= -1e-6).all(), "must stay monotone"
            if prev is not None:
                # continuity: small factor steps move vertices slightly
                assert np.abs(p - prev).max() < 0.08, (f, p, prev)
            prev = p

    def test_shared_edge_factors_crack_free(self):
        """Two patches sharing an edge compute identical boundary vertex
        positions for ANY camera: factors come from the shared midpoint."""
        from vqengine_tpu.ops import tessellation as tess
        corners = np.asarray([
            # patch A: x in [0,1]; patch B: x in [1,2]; shared edge x=1
            [[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]],
            [[1, 0, 0], [2, 0, 0], [1, 0, 1], [2, 0, 1]],
        ], np.float32)
        normals = np.broadcast_to(
            np.asarray([0, 1, 0], np.float32), corners.shape).copy()
        uvs = corners[..., (0, 2)].copy()
        params, tri_idx = tess.build_patch_template()
        world = jnp.eye(4)[None]
        planes = jnp.asarray(np.tile(
            np.asarray([[0, 0, 0, 1e9]], np.float32), (6, 1)))
        cam = jnp.asarray([0.3, 2.0, 0.2])  # asymmetric on purpose
        cp, cn, ct, cu, ti, live = tess.amplify(
            jnp.asarray(corners), jnp.asarray(normals), jnp.asarray(uvs),
            jnp.zeros(2, jnp.int32), world, cam, planes,
            jnp.asarray(params), jnp.asarray(tri_idx), tess_scale=3.0)
        cp = np.asarray(cp)
        t = tri_idx.shape[0]
        a = cp[: 3 * t].reshape(-1, 3)
        b = cp[3 * t: 6 * t].reshape(-1, 3)
        edge_a = a[np.abs(a[:, 0] - 1.0) < 1e-6]
        edge_b = b[np.abs(b[:, 0] - 1.0) < 1e-6]
        assert len(edge_a) and len(edge_b)
        za = np.unique(np.round(edge_a[:, 2], 5))
        zb = np.unique(np.round(edge_b[:, 2], 5))
        np.testing.assert_array_equal(za, zb)

    def test_cull_drops_outside_patches(self):
        from vqengine_tpu.ops import tessellation as tess
        # plane x >= 0 (normal +x): patch B sits entirely at x < -1
        planes = np.zeros((6, 4), np.float32)
        planes[:, 3] = 1e9
        planes[0] = [1, 0, 0, 0]
        corners = np.asarray([
            [[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]],
            [[-3, 0, 0], [-2, 0, 0], [-3, 0, 1], [-2, 0, 1]],
        ], np.float32)
        live = np.asarray(tess.cull_patches(
            jnp.asarray(corners), jnp.asarray(planes)))
        assert live[0] and not live[1]

    def _render(self, mesh, w=160, h=96, eye=(0.0, 2.5, -3.0)):
        from vqengine_tpu.render import graph
        from vqengine_tpu.render.renderer import VQRendererTPU
        from vqengine_tpu.render.scene_buffers import (DrawItem,
                                                       build_scene_buffers)
        from vqengine_tpu.scene.camera import Camera, FCameraParameters
        from vqengine_tpu.scene.light import ELightType, Light
        from vqengine_tpu.scene.material import Material
        from vqengine_tpu.utils import math3d as m3
        items = [DrawItem("t", mesh, m3.Transform(), 0, 0)]
        buffers = build_scene_buffers(items, [Material(name="m")])
        scene = graph.upload_scene(buffers, bucketize=False)
        p = FCameraParameters()
        p.position = np.array(eye, np.float32)
        p.pitch_deg = 35.0
        p.near_z, p.far_z = 0.1, 100.0
        cam = Camera(p, aspect=w / h)
        consts = VQRendererTPU().build_frame_constants(
            buffers, cam, [Light(type=ELightType.DIRECTIONAL,
                                 brightness=1.5)])
        out = graph.render_forward(scene, consts, w, h)
        return np.asarray(out["ldr"]), np.asarray(out["depth"])

    def test_factor1_matches_untessellated_exactly(self):
        """tess_scale -> 0 forces factor 1 everywhere: the amplified
        patches must reproduce the control mesh bit-for-bit (geometry AND
        shading for the undisplaced patch; geometry for the displaced one,
        whose amplified normals come from the displaced-surface finite
        differences rather than the control LOD's flat per-vertex
        normals)."""
        from vqengine_tpu.scene import mesh as meshmod
        patched = meshmod.patch_grid(4.0, 4.0, 3, 3, tess_scale=1e-4)
        control = meshmod.Mesh("flat", [patched.lods[0]])  # same geometry
        ldr_p, dep_p = self._render(patched)
        ldr_c, dep_c = self._render(control)
        np.testing.assert_allclose(dep_p, dep_c, atol=1e-6)
        np.testing.assert_allclose(ldr_p, ldr_c, atol=2e-3)

    def test_factor1_displaced_geometry_matches(self):
        """Displaced factor-1 amplification lands on the control LOD's
        vertices exactly (both sample the heightmap bilinearly)."""
        from vqengine_tpu.scene import mesh as meshmod
        rng = np.random.default_rng(7)
        hm = rng.random((32, 32)).astype(np.float32)
        patched = meshmod.patch_grid(4.0, 4.0, 3, 3, heightmap=hm,
                                     disp_scale=0.8, tess_scale=1e-4)
        control = meshmod.Mesh("flat", [patched.lods[0]])  # same geometry
        _, dep_p = self._render(patched)
        _, dep_c = self._render(control)
        np.testing.assert_allclose(dep_p, dep_c, atol=1e-6)

    def test_refinement_adds_geometry_with_distance_factors(self):
        """Closer camera / larger tess_scale -> more live triangles and a
        surface that tracks the heightmap more closely."""
        from vqengine_tpu.scene import mesh as meshmod
        # a single bump in the middle
        hm = np.zeros((33, 33), np.float32)
        hm[12:21, 12:21] = 1.0
        coarse = meshmod.patch_grid(4.0, 4.0, 2, 2, heightmap=hm,
                                    disp_scale=0.8, tess_scale=1e-4)
        fine = meshmod.patch_grid(4.0, 4.0, 2, 2, heightmap=hm,
                                  disp_scale=0.8, tess_scale=40.0)
        # ground truth: a dense factor-1 control grid (16x16 patches
        # sample the 33^2 heightmap well) — refinement must move the
        # rendered surface TOWARD it
        dense = meshmod.patch_grid(4.0, 4.0, 16, 16, heightmap=hm,
                                   disp_scale=0.8, tess_scale=1e-4)
        _, dep_c = self._render(coarse)
        _, dep_f = self._render(fine)
        _, dep_gt = self._render(dense)
        # the coarse control grid undersamples the bump: refinement must
        # change the image...
        assert np.abs(dep_f - dep_c).max() > 1e-3
        # ...and land closer to the densely-sampled ground truth
        err_c = np.abs(dep_c - dep_gt).mean()
        err_f = np.abs(dep_f - dep_gt).mean()
        assert err_f < err_c * 0.5, (err_f, err_c)


class TestTriDomain:
    """TRI-domain material-driven tessellation (ops/tessellation.py
    amplify_tri) — the reference's tri-domain HS/DS path driven by the
    material's packed tess byte (Material.h, Tessellation.hlsl
    domain(\"tri\"))."""

    def test_template_valid(self):
        from vqengine_tpu.ops import tessellation as tess
        m = tess.MAX_SEGS
        bary, tri_idx = tess.build_tri_template()
        assert bary.shape == ((m + 1) * (m + 2) // 2, 3)
        np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-6)
        assert tri_idx.shape == (m * m, 3)

    def test_factor1_collapses_to_corner_fan(self):
        """All factors 1: boundary verts land on the 3 corners, interior
        on the centroid — live distinct triangles form the 3-tri fan of
        the flat control triangle (exact param-equality collapse)."""
        from vqengine_tpu.ops import tessellation as tess
        bary, tri_idx = tess.build_tri_template()
        one = jnp.ones((1,))
        b = np.asarray(tess.snap_bary(jnp.asarray(bary), one, one, one,
                                      one))[0]
        uniq = np.unique(np.round(b.astype(np.float64), 6), axis=0)
        third = round(1.0 / 3.0, 6)
        expect = {(0.0, 0.0, 1.0), (0.0, 1.0, 0.0), (1.0, 0.0, 0.0),
                  (third, third, third)}
        assert {tuple(r) for r in uniq} == expect
        tb = b[tri_idx]
        collapsed = ((tb[:, 0] == tb[:, 1]).all(-1)
                     | (tb[:, 1] == tb[:, 2]).all(-1)
                     | (tb[:, 0] == tb[:, 2]).all(-1))
        assert (~collapsed).sum() == 3

    def test_full_factor_is_identity(self):
        from vqengine_tpu.ops import tessellation as tess
        m = float(tess.MAX_SEGS)
        bary, _ = tess.build_tri_template()
        f = jnp.full((1,), m)
        b = np.asarray(tess.snap_bary(jnp.asarray(bary), f, f, f, f))[0]
        np.testing.assert_allclose(b, bary, atol=1e-6)

    def test_shared_edge_crack_free(self):
        """Two tri patches sharing an edge (opposite orientations)
        produce identical snapped world vertices along it for an
        asymmetric camera — the quad path's invariant."""
        from vqengine_tpu.ops import tessellation as tess
        corners = np.asarray([
            [[0, 0, 0], [1, 0, 0], [0, 0, 1]],   # A: edge (1,0,0)-(0,0,1)
            [[1, 0, 1], [0, 0, 1], [1, 0, 0]],   # B shares it, reversed
        ], np.float32)
        normals = np.broadcast_to(
            np.asarray([0, 1, 0], np.float32), corners.shape).copy()
        uvs = corners[..., (0, 2)].copy()
        bary, tri_idx = tess.build_tri_template()
        world = jnp.eye(4)[None]
        planes = jnp.asarray(np.tile(
            np.asarray([[0, 0, 0, 1e9]], np.float32), (6, 1)))
        cam = jnp.asarray([0.27, 1.7, -0.4])
        cp, cn, ct, cu, ti, live = tess.amplify_tri(
            jnp.asarray(corners), jnp.asarray(normals), jnp.asarray(uvs),
            jnp.zeros(2, jnp.int32), world, cam, planes,
            jnp.asarray(bary), jnp.asarray(tri_idx), tess_scale=2.5)
        cp = np.asarray(cp)
        t = tri_idx.shape[0]
        a = cp[: 3 * t].reshape(-1, 3)
        b = cp[3 * t: 6 * t].reshape(-1, 3)
        # the shared edge is x + z = 1 (between (1,0,0) and (0,0,1))
        ea = a[np.abs(a[:, 0] + a[:, 2] - 1.0) < 1e-6]
        eb = b[np.abs(b[:, 0] + b[:, 2] - 1.0) < 1e-6]
        assert len(ea) and len(eb)
        za = np.unique(np.round(ea[:, 2], 5))
        zb = np.unique(np.round(eb[:, 2], 5))
        np.testing.assert_array_equal(za, zb)

    def _render_scene(self, items, materials, w=160, h=96,
                      eye=(0.0, 2.5, -3.0)):
        from vqengine_tpu.render import graph
        from vqengine_tpu.render.renderer import VQRendererTPU
        from vqengine_tpu.render.scene_buffers import build_scene_buffers
        from vqengine_tpu.scene.camera import Camera, FCameraParameters
        from vqengine_tpu.scene.light import ELightType, Light
        buffers = build_scene_buffers(items, materials)
        scene = graph.upload_scene(buffers, bucketize=False)
        p = FCameraParameters()
        p.position = np.array(eye, np.float32)
        p.pitch_deg = 35.0
        p.near_z, p.far_z = 0.1, 100.0
        cam = Camera(p, aspect=w / h)
        consts = VQRendererTPU().build_frame_constants(
            buffers, cam, [Light(type=ELightType.DIRECTIONAL,
                                 brightness=1.5)])
        out = graph.render_forward(scene, consts, w, h)
        return buffers, np.asarray(out["ldr"]), np.asarray(out["depth"])

    def test_material_driven_assembly_and_factor1_exact(self):
        """Material.tessellation_enabled promotes an ordinary mesh's base
        triangles to control patches (suffix contract), and tess_scale->0
        reproduces the plain render to raster precision (the factor-1
        corner fan triangulates the SAME plane through the centroid
        vertex, so interpolated depth differs only by plane-equation
        rounding, ~5e-6)."""
        from vqengine_tpu.render.scene_buffers import DrawItem
        from vqengine_tpu.scene.material import Material
        from vqengine_tpu.utils import math3d as m3
        grid = meshmod.grid(4.0, 4.0, 4, 4)
        t_mat = Material(name="t")
        t_mat.tessellation_enabled = True
        t_mat.tessellation_scale = 1e-4
        items = [DrawItem("g", grid, m3.Transform(), 0, 0)]
        buffers, _, dep_t = self._render_scene(items, [t_mat])
        assert buffers.tpatch_corners is not None
        assert buffers.tpatch_corners.shape[0] == grid.lods[0].num_triangles
        assert buffers.num_tris_main == 0      # every tri became a patch
        plain = Material(name="p")
        _, _, dep_p = self._render_scene(items, [plain])
        np.testing.assert_allclose(dep_t, dep_p, atol=2e-5)

    def test_displacement_refines_with_distance_factor(self):
        """A displaced tessellated material tracks its heightmap better
        at a working tess_scale than at factor 1."""
        from vqengine_tpu.render.scene_buffers import DrawItem
        from vqengine_tpu.scene.material import Material
        from vqengine_tpu.utils import math3d as m3
        hm = np.zeros((33, 33), np.float32)
        hm[12:21, 12:21] = 1.0

        def mat(scale):
            m = Material(name="t")
            m.tessellation_enabled = True
            m.tessellation_scale = scale
            m.displacement = 0.8
            m.height_map_image = hm
            return m

        # dense ground truth: a fine factor-1 grid displaced at its
        # control vertices by the same field (mesh-level displace)
        gt_lod = meshmod.displace(meshmod.grid(4.0, 4.0, 16, 16).lods[0],
                                  hm, 0.8)
        gt_mesh = meshmod.Mesh("gt", [gt_lod])
        coarse = meshmod.grid(4.0, 4.0, 2, 2)
        items = [DrawItem("g", coarse, m3.Transform(), 0, 0)]
        _, _, dep_c = self._render_scene(items, [mat(1e-4)])
        _, _, dep_f = self._render_scene(items, [mat(40.0)])
        assert np.abs(dep_f - dep_c).max() > 1e-3
        fine_items = [DrawItem("g", gt_mesh, m3.Transform(), 0, 0)]
        _, _, dep_gt = self._render_scene(fine_items, [Material(name="p")])
        assert (np.abs(dep_f - dep_gt).mean()
                < np.abs(dep_c - dep_gt).mean())
