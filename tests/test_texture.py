import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.ops import texture as tex
from vqengine_tpu.scene.texture_manager import (ETextureState, TextureManager,
                                                checkerboard, generate_mips)


class TestTextureManager:
    def test_create_dedup_and_states(self):
        tm = TextureManager(size=32)
        a = tm.create_from_array("a", np.ones((16, 16, 3), np.float32))
        b = tm.create_from_array("a", np.zeros((16, 16, 3), np.float32))
        assert a == b  # dedup by key
        assert tm.state(a) == ETextureState.READY

    def test_missing_file_fails(self):
        tm = TextureManager(size=32)
        tid = tm.create_from_file("does/not/exist.png")
        tm.wait_all()
        assert tm.state(tid) == ETextureState.FAILED

    def test_device_arrays_mips(self):
        tm = TextureManager(size=64)
        tm.create_from_array("c", checkerboard(64, 8))
        mips = tm.build_device_arrays()
        assert mips[0].shape == (1, 64, 64, 4)
        assert mips[-1].shape[1] == 1
        # checkerboard averages to grey at the top mip
        top = np.asarray(mips[-1])[0, 0, 0, :3]
        np.testing.assert_allclose(top, 0.5, atol=0.01)

    def test_mips_energy(self):
        img = np.random.default_rng(0).uniform(0, 1, (32, 32, 4)).astype(np.float32)
        mips = generate_mips(img)
        assert len(mips) == 6
        assert abs(mips[-1].mean() - img.mean()) < 1e-3


class TestSampling:
    def test_identity_sample(self):
        img = np.random.default_rng(1).uniform(0, 1, (16, 16, 4)).astype(np.float32)
        mips = [jnp.asarray(img[None])]
        # sample at texel centers -> exact values
        uv = jnp.stack(jnp.meshgrid(
            (jnp.arange(16) + 0.5) / 16, (jnp.arange(16) + 0.5) / 16,
            indexing="xy"), -1)
        tid = jnp.zeros((16, 16), jnp.int32)
        out = np.asarray(tex.sample_texture_array(mips, tid, uv,
                                                  lod=jnp.zeros((16, 16))))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_mip_selection_by_derivatives(self):
        # highly stretched uv -> coarser mip
        h = w = 32
        uv_fine = jnp.stack(jnp.meshgrid(
            jnp.linspace(0, 0.1, w), jnp.linspace(0, 0.1, h), indexing="xy"), -1)
        uv_coarse = jnp.stack(jnp.meshgrid(
            jnp.linspace(0, 8.0, w), jnp.linspace(0, 8.0, h), indexing="xy"), -1)
        lod_f = np.asarray(tex.uv_mip_level(uv_fine, 64, 6))
        lod_c = np.asarray(tex.uv_mip_level(uv_coarse, 64, 6))
        assert lod_c.mean() > lod_f.mean() + 2

    def test_normal_unpack_identity(self):
        # flat normal map (0.5, 0.5, 1) -> the surface normal
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        t = jnp.asarray([[1.0, 0.0, 0.0]])
        s = jnp.asarray([[0.5, 0.5, 1.0]])
        out = np.asarray(tex.unpack_normal_map(s, n, t))
        np.testing.assert_allclose(out, [[0, 1, 0]], atol=1e-5)

    def test_normal_unpack_perturbed(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        t = jnp.asarray([[1.0, 0.0, 0.0]])
        s = jnp.asarray([[1.0, 0.5, 0.5]])  # tilt toward tangent
        out = np.asarray(tex.unpack_normal_map(s, n, t))
        assert out[0, 0] > 0.5  # leans along the tangent
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)


class TestVisualization:
    def test_modes(self):
        from vqengine_tpu.ops import visualization as viz
        h = w = 8
        ldr = jnp.zeros((h, w, 3))
        depth = jnp.full((h, w), 0.5)
        normals = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (h, w, 3))
        oid = jnp.arange(h * w).reshape(h, w)
        for mode in range(9):
            out = viz.visualize(mode, ldr, depth=depth, normals=normals,
                                roughness=depth, metalness=depth, ao=depth,
                                albedo=ldr, motion=jnp.zeros((h, w, 2)),
                                object_id=oid)
            assert out.shape == (h, w, 3)

    def test_outline_and_magnifier(self):
        from vqengine_tpu.ops import visualization as viz
        img = jnp.zeros((32, 32, 3))
        oid = jnp.zeros((32, 32), jnp.int32)
        oid = oid.at[10:20, 10:20].set(7)
        out = np.asarray(viz.outline(img, oid, 7, thickness=1))
        assert out.sum() > 0  # rim drawn
        mag = np.asarray(viz.magnifier(img, (0.5, 0.5), 0.2))
        assert np.isfinite(mag).all()


class TestHud:
    def test_stamp(self):
        from vqengine_tpu.render.hud import stamp_text
        img = np.zeros((32, 128, 3), np.float32)
        out = stamp_text(img, "FPS 60.0", 2, 2)
        assert out.sum() > 0
        assert (img == 0).all()  # original untouched


class TestPackedTextures:
    def _mips(self, rng, n=3, size=16):
        from vqengine_tpu.scene.texture_manager import generate_mips
        imgs = [rng.random((size, size, 4)).astype(np.float32)
                for _ in range(n)]
        per_tex = [generate_mips(img) for img in imgs]
        return [jnp.asarray(np.stack([m[l] for m in per_tex]))
                for l in range(len(per_tex[0]))]

    def test_matches_f32_bilinear(self):
        """Quad-packed RGBA8 sampling matches the f32 array-of-textures
        path within 8-bit quantization, including uv wrap and mip select."""
        from vqengine_tpu.ops import texture as tex
        rng = np.random.default_rng(11)
        mips = self._mips(rng)
        packed = tex.pack_texture_quads([np.asarray(m) for m in mips])
        h = w = 24
        uv = jnp.asarray(rng.uniform(-1.5, 2.5, (h, w, 2)).astype(np.float32))
        tid = jnp.asarray(rng.integers(0, 3, (h, w)).astype(np.int32))
        for lod in (jnp.zeros((h, w)), jnp.full((h, w), 1.3),
                    jnp.full((h, w), 3.0)):
            ref = np.asarray(tex.sample_texture_array(mips, tid, uv, lod))
            got = np.asarray(tex.sample_texture_array(packed, tid, uv, lod))
            np.testing.assert_allclose(got, ref, atol=2.5 / 255.0)

    def test_aniso_dispatch(self):
        from vqengine_tpu.ops import texture as tex
        rng = np.random.default_rng(12)
        mips = self._mips(rng)
        packed = tex.pack_texture_quads([np.asarray(m) for m in mips])
        h = w = 16
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        uv = jnp.asarray(np.stack([xx / w, yy / h * 4.0], -1))  # stretched v
        tid = jnp.zeros((h, w), jnp.int32)
        ref = np.asarray(tex.sample_texture_array_aniso(mips, tid, uv))
        got = np.asarray(tex.sample_texture_array_aniso(packed, tid, uv))
        np.testing.assert_allclose(got, ref, atol=3.0 / 255.0)


class TestCombinedAux:
    """combine_aux_maps fuses normal/roughness/metallic into one RGBA map
    sampled once in material_pass (fetch-count economy on TPU)."""

    def _scene(self, combine: bool):
        from vqengine_tpu.render import graph
        from vqengine_tpu.render.renderer import VQRendererTPU
        from vqengine_tpu.render.scene_buffers import (DrawItem,
                                                       build_scene_buffers)
        from vqengine_tpu.scene.camera import Camera, FCameraParameters
        from vqengine_tpu.scene.light import ELightType, Light
        from vqengine_tpu.scene.material import Material
        from vqengine_tpu.scene.texture_manager import (noise_texture,
                                                        normal_from_height)
        from vqengine_tpu.scene import mesh as meshmod
        from vqengine_tpu.utils import math3d as m3

        tm = TextureManager(size=32)
        h = noise_texture(32, seed=5)
        n_id = tm.create_from_array("n", normal_from_height(h, 1.5))
        r_id = tm.create_from_array("r", noise_texture(32, base=0.5, amp=0.4))
        mat = Material(name="m", roughness=0.9, metalness=0.3)
        mat.textures = {"normal": n_id, "roughness": r_id}
        if combine:
            assert tm.combine_aux_maps([mat]) == 1
            assert mat.combined_aux >= 0
            assert "normal" not in mat.textures
        textures = tm.build_device_arrays_packed()
        items = [DrawItem("q", meshmod.quad(3.0), m3.Transform(), 0, 0)]
        buffers = build_scene_buffers(items, [mat])
        scene = graph.upload_scene(buffers, bucketize=False)
        p = FCameraParameters()
        p.position = np.array([0, 0.5, -3], np.float32)
        cam = Camera(p, aspect=128 / 64)
        consts = VQRendererTPU().build_frame_constants(
            buffers, cam, [Light(type=ELightType.DIRECTIONAL, brightness=2.0)])
        out = graph.render_forward(
            scene, consts, 128, 64, textures=textures,
            slots_used=graph.slots_used_of(buffers.materials),
            enable_shadows=False)
        return np.asarray(out["ldr"])

    def test_combined_matches_separate(self):
        sep = self._scene(combine=False)
        com = self._scene(combine=True)
        # z reconstructs from xy: identical up to the normal map's own
        # quantization; the lit image must match closely
        assert np.abs(sep - com).max() < 5e-3

    def test_unpack_xy_roundtrip(self):
        rng = np.random.default_rng(0)
        n_ts = rng.normal(size=(8, 8, 3)).astype(np.float32)
        n_ts[..., 2] = np.abs(n_ts[..., 2]) + 0.1
        n_ts /= np.linalg.norm(n_ts, axis=-1, keepdims=True)
        wn = jnp.asarray(np.tile([0.0, 0.0, 1.0], (8, 8, 1)).astype(np.float32))
        wt = jnp.asarray(np.tile([1.0, 0.0, 0.0], (8, 8, 1)).astype(np.float32))
        full = tex.unpack_normal_map(jnp.asarray(n_ts * 0.5 + 0.5), wn, wt)
        xy = tex.unpack_normal_map_xy(jnp.asarray(n_ts[..., :2] * 0.5 + 0.5),
                                      wn, wt)
        np.testing.assert_allclose(np.asarray(full), np.asarray(xy), atol=1e-5)


class TestPairQuads:
    """combine_pair_quads packs a material's diffuse + combined-aux quads
    into one 32 B gather row: the material pass's two dense fetches
    become ONE (fetch-count economy; ops/texture.pair_flat)."""

    def _tm_and_mat(self):
        from vqengine_tpu.scene.material import Material
        from vqengine_tpu.scene.texture_manager import (
            TextureManager, brick, noise_texture, normal_from_height)
        tm = TextureManager(size=32)
        d_id = tm.create_from_array("d", brick(32))
        h = noise_texture(32, seed=5)
        n_id = tm.create_from_array("n", normal_from_height(h, 1.5))
        r_id = tm.create_from_array("r", noise_texture(32, base=0.5, amp=0.4))
        mat = Material(name="m", roughness=0.9, metalness=0.3)
        mat.textures = {"diffuse": d_id, "normal": n_id, "roughness": r_id}
        assert tm.combine_aux_maps([mat]) == 1
        return tm, mat, d_id

    def test_pair_tap_matches_separate(self):
        import jax.numpy as jnp
        from vqengine_tpu.ops import texture as tex
        tm, mat, d_id = self._tm_and_mat()
        assert tm.combine_pair_quads([mat]) == 1
        pt = tm.build_device_arrays_packed()
        assert pt.pair_flat is not None
        h, w = 16, 24
        rng = np.random.default_rng(3)
        uv = jnp.asarray(rng.random((h, w, 2), np.float32) * 2.0)
        lod = jnp.asarray(rng.random((h, w), np.float32) * 4.0)
        jit = tex.mip_jitter(h, w)
        pid = jnp.full((h, w), mat.pair_map, jnp.int32)
        d_pair, a_pair = tex.sample_texture_pair(pt, pid, uv, lod, jit)
        d_sep = tex.sample_texture_array(
            pt, jnp.full((h, w), d_id, jnp.int32), uv, lod, jitter=jit)
        a_sep = tex.sample_texture_array(
            pt, jnp.full((h, w), mat.combined_aux, jnp.int32), uv, lod,
            jitter=jit)
        np.testing.assert_allclose(np.asarray(d_pair), np.asarray(d_sep),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a_pair), np.asarray(a_sep),
                                   atol=1e-6)

    def test_pair_aniso_diffuse_matches_unpaired(self):
        import jax.numpy as jnp
        from vqengine_tpu.ops import texture as tex
        tm, mat, d_id = self._tm_and_mat()
        assert tm.combine_pair_quads([mat]) == 1
        pt = tm.build_device_arrays_packed()
        h, w = 32, 48
        ys = (np.arange(h, dtype=np.float32) + 1.0)[:, None]
        xs = np.arange(w, dtype=np.float32)[None, :]
        uv = jnp.asarray(np.stack(np.broadcast_arrays(
            xs / w * 4.0, 40.0 / ys), axis=-1).astype(np.float32))
        jit = tex.mip_jitter(h, w)
        tid = jnp.full((h, w), d_id, jnp.int32)
        pid = jnp.full((h, w), mat.pair_map, jnp.int32)
        d_pair, _ = tex.sample_texture_pair_aniso(
            pt, pid, tid, uv, num_taps=4, jitter=jit, adaptive_frac=4)
        d_sep = tex.sample_texture_array_aniso(
            pt, tid, uv, num_taps=4, jitter=jit, adaptive_frac=4)
        np.testing.assert_allclose(np.asarray(d_pair), np.asarray(d_sep),
                                   atol=1e-6)

    def test_mip_bias_disables_pairing(self):
        tm, mat, _ = self._tm_and_mat()
        mat.normal_map_mip_bias = 1.0
        assert tm.combine_pair_quads([mat]) == 0
        assert mat.pair_map == -1
        assert tm.build_device_arrays_packed().pair_flat is None


class TestAdaptiveAniso:
    """The AnisoSampler's economics as compaction: one dense trilinear
    tap + the full ellipse walk only on compacted high-anisotropy pixels
    (ForwardLighting.hlsl:81 AnisoSampler / MaxAnisotropy=16)."""

    def _grazing_setup(self):
        import numpy as np
        from vqengine_tpu.ops import texture as tex
        from vqengine_tpu.scene.texture_manager import (checkerboard,
                                                        generate_mips)
        mips_np = generate_mips(checkerboard(64, 8))
        mips = tex.pack_texture_quads(
            [m[None] for m in mips_np])
        h, w = 32, 48
        # floor-like uv: strong v-gradient growth toward the top rows
        ys = (np.arange(h, dtype=np.float32) + 1.0)[:, None]
        xs = np.arange(w, dtype=np.float32)[None, :]
        u = xs / w * 4.0 + 0 * ys
        v = 40.0 / ys                     # compresses fast near row 0
        uv = np.stack(np.broadcast_arrays(u, v), axis=-1).astype(np.float32)
        tid = np.zeros((h, w), np.int32)
        import jax.numpy as jnp
        return mips, jnp.asarray(tid), jnp.asarray(uv)

    def test_adaptive_matches_dense_on_aniso_pixels(self):
        import jax.numpy as jnp
        import numpy as np
        from vqengine_tpu.ops import texture as tex
        mips, tid, uv = self._grazing_setup()
        dense = np.asarray(tex.sample_texture_array_aniso(
            mips, tid, uv, num_taps=4))
        # frac=1: capacity covers every pixel, so active rays must agree
        # EXACTLY; smaller fracs gracefully truncate to the clamped tap
        adap = np.asarray(tex.sample_texture_array_aniso(
            mips, tid, uv, num_taps=4, adaptive_frac=1))
        _, _, ratio, _ = tex.uv_mip_level_aniso(
            uv, tex.tex_base_size(mips), tex.tex_num_levels(mips) - 1,
            max_aniso=8.0)
        ratio = np.asarray(ratio)
        hi = ratio > 1.3
        assert hi.any() and (~hi).any(), "test scene must mix both regimes"
        # exact agreement where the ellipse walk ran
        np.testing.assert_allclose(adap[hi], dense[hi], atol=1e-6)
        # isotropic pixels: single clamped tap stays close to the dense
        # multi-tap result (same footprint, fewer samples)
        assert np.abs(adap[~hi] - dense[~hi]).mean() < 0.06
