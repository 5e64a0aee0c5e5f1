"""Decompose setup + binning cost on TPU (honest scan timing).

Isolates: clip transform, triangle setup, record packing, key
compact+sort, record gather — to target the geometry-side optimizations.
Run alone — one axon client at a time.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import build_sponza_stress  # noqa: E402


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from vqengine_tpu.ops import culling, palette, raster
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights = build_sponza_stress()[:2]
    scene = graph.upload_scene(buffers)

    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg, p.yaw_deg = 15.0, -90.0
    p.fov_v_deg, p.near_z, p.far_z = 60.0, 0.5, 4000.0
    cam = Camera(p, aspect=width / height)
    renderer = VQRendererTPU()

    n = 16
    cam_list = []
    for i in range(n):
        cam.yaw = -90.0 + 4.0 * np.sin(i * 0.15)
        cam_list.append(renderer.build_frame_constants(buffers, cam, lights))
    consts_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *cam_list)

    print(f"T (padded tris) = {scene.indices.shape[0]}", flush=True)

    def checksum(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
                   if hasattr(x, "astype"))

    def timed(name, frame_fn):
        @jax.jit
        def run_n(consts_batch):
            def step(carry, consts_i):
                return carry + frame_fn(consts_i), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), consts_batch)
            return tot

        @jax.jit
        def nop(t):
            return t + 1

        _ = np.asarray(run_n(consts_batch))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run_n(consts_batch))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:30s} {ms:8.2f} ms/frame", flush=True)

    def clip_of(consts):
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        return raster.transform_clip_instanced(
            scene.positions, scene.item_of_vertex, wvp)

    def setup_of(consts):
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        return raster.setup_triangles(clip_of(consts), scene.indices,
                                      width, height, tri_mask=tri_mask)

    def extra_of(consts):
        n_items = consts.normal_mats.shape[0]
        nrm_v = palette.palette_lookup(
            scene.item_of_vertex, consts.normal_mats.reshape(n_items, 9)
        ).reshape(-1, 3, 3)
        wnrm = jnp.einsum("vij,vj->vi", nrm_v, scene.normals)
        wtan = jnp.einsum("vij,vj->vi", nrm_v, scene.tangents)
        return raster.pack_gbuf_extra(
            wnrm, wtan, scene.uvs, scene.indices,
            scene.item_material[scene.tri_item],
            scene.item_object[scene.tri_item], scene.tri_item)

    def records_of(consts):
        return raster._pack_records(setup_of(consts), extra_of(consts))

    def sortkeys_of(consts, with_gather):
        setup = setup_of(consts)
        t = setup.edges9.shape[0]
        records = raster._pack_records(setup, extra_of(consts))
        tiles_x = raster.cdiv(width, raster.TILE_W)
        tiles_y = raster.cdiv(height, raster.TILE_H)
        nt = tiles_x * tiles_y
        tx0, ty0 = setup.tile_lo[:, 0], setup.tile_lo[:, 1]
        tx1, ty1 = setup.tile_hi[:, 0], setup.tile_hi[:, 1]
        ncover = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
        k_max = raster.K_MAX_DEFAULT
        small = setup.valid & ~setup.big & (ncover <= k_max)
        k = jnp.arange(k_max, dtype=jnp.int32)[None, :]
        sw = jnp.maximum(tx1 - tx0 + 1, 1)[:, None]
        tile = (ty0[:, None] + k // sw) * tiles_x + (tx0[:, None] + k % sw)
        pair_ok = small[:, None] & (k < ncover[:, None])
        tri_ids = jax.lax.broadcasted_iota(jnp.uint32, (t, k_max), 0)
        keys = (tile.astype(jnp.uint32) << 22) | tri_ids
        cap = raster.cdiv(t, raster.GROUP) * raster.GROUP
        n_eff = pair_ok.sum(axis=1).astype(jnp.int32)
        offs = jnp.cumsum(n_eff) - n_eff
        k_rank = jnp.cumsum(pair_ok.astype(jnp.int32), axis=1) - 1
        pos = jnp.where(pair_ok, offs[:, None] + k_rank, cap)
        compact = jnp.full((cap,), jnp.uint32(0xFFFFFFFF))
        compact = compact.at[pos.reshape(-1)].set(keys.reshape(-1),
                                                  mode="drop")
        sorted_keys = jax.lax.sort(compact, is_stable=False)
        if not with_gather:
            return checksum((sorted_keys, records[:8]))
        sorted_tids = (sorted_keys >> 22).astype(jnp.int32)
        tri_of_pair = (sorted_keys & jnp.uint32((1 << 22) - 1)).astype(jnp.int32)
        pair_records = jnp.where(
            (sorted_tids < nt)[:, None],
            records[jnp.minimum(tri_of_pair, t - 1)],
            raster._killed_record(records.shape[1]))
        return checksum(pair_records)

    timed("clip transform", lambda c: checksum(clip_of(c)))
    timed("+tri setup (cull+edges)", lambda c: checksum(setup_of(c)))
    timed("+pack records[T,48]", lambda c: checksum(records_of(c)))
    timed("+keys compact+sort", lambda c: sortkeys_of(c, False))
    timed("+record gather[cap,48]", lambda c: sortkeys_of(c, True))
    timed("full bin_triangles", lambda c: checksum(
        raster.bin_triangles(setup_of(c), width, height, extra=extra_of(c))))


if __name__ == "__main__":
    main()
