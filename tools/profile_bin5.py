"""In-context decomposition of the POST-merge bin_triangles at bench-scene
sizes: cumulative prefixes of the REAL pipeline (real setup/records from
the Sponza stress scene, varying camera per scan iter, checksummed), so
deltas give each primitive's in-context cost including fusion boundaries —
the synthetic micros (profile_bin4) summed to ~12 of a measured ~18-24 ms,
and the gap is what this tool is for. Run ALONE on the TPU."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bench import build_sponza_stress
    from vqengine_tpu.ops import culling, raster
    from vqengine_tpu.ops.raster import (GROUP, K_MAX_DEFAULT, cdiv,
                                         _bin_one_axis, _group_blocks,
                                         _killed_record, _pack_records,
                                         _radix_rank_pass)
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, textures = build_sponza_stress()
    scene = graph.upload_scene(buffers)

    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg = 15.0
    p.yaw_deg = -90.0
    p.fov_v_deg = 60.0
    p.near_z, p.far_z = 0.5, 4000.0
    cam = Camera(p, aspect=width / height)
    renderer = VQRendererTPU()
    n = 16
    cam_list = []
    for i in range(n):
        cam.yaw = -90.0 + 4.0 * np.sin(i * 0.15)
        cam_list.append(renderer.build_frame_constants(buffers, cam, lights))
    consts_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *cam_list)

    def setup_of(consts):
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        tl = scene.num_tris_live
        tri_item = scene.tri_item[:tl]
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)
        setup = raster.setup_triangles(clip_c, None, width, height,
                                       tri_mask=tri_mask[:tl])
        extra = raster.pack_gbuf_extra_corners(
            scene.corner_normals, scene.corner_tangents, scene.corner_uvs,
            tri_item, consts.normal_mats,
            scene.item_material[tri_item], scene.item_object[tri_item])
        return setup, extra

    # replicate bin_triangles stage-by-stage (raster.py bin_triangles)
    tiles_x = cdiv(width, raster.TILE_W)
    tiles_y = cdiv(height, raster.TILE_H)
    nt = tiles_x * tiles_y
    k_max = K_MAX_DEFAULT

    def chk(x):
        return x.astype(jnp.float32).sum() if x.dtype != jnp.float32 \
            else x.sum()

    def prefix(stage, consts):
        setup, extra = setup_of(consts)
        if stage == "setup":
            return chk(setup.edges9) + chk(extra)
        records = _pack_records(setup, extra)
        if stage == "records":
            return chk(records)
        t = setup.edges9.shape[0]
        pair_capacity = (max(GROUP, min(t, 4 * 1024 * 1024))
                         + max(8192, t // 4))
        cap = cdiv(pair_capacity, GROUP) * GROUP
        tx0, ty0 = setup.tile_lo[:, 0], setup.tile_lo[:, 1]
        tx1, ty1 = setup.tile_hi[:, 0], setup.tile_hi[:, 1]
        span_w = tx1 - tx0 + 1
        span_h = ty1 - ty0 + 1
        ncover = span_w * span_h
        small = setup.valid & ~setup.big & (ncover <= k_max)
        medium = setup.valid & ~setup.big & (ncover > k_max)
        nc = jnp.where(small, ncover,
                       jnp.where(medium, span_h, 0)).astype(jnp.int32)
        tri_cols = jnp.stack([tx0, ty0, span_w,
                              medium.astype(jnp.int32)], axis=1)
        nbins = nt + tiles_y

        def combined_bin(rowp, k):
            sw = jnp.maximum(rowp[:, 2], 1)
            q = jnp.floor((k.astype(jnp.float32) + 0.5)
                          / sw.astype(jnp.float32)).astype(jnp.int32)
            fine = (rowp[:, 1] + q) * tiles_x + rowp[:, 0] + (k - q * sw)
            row = nt + rowp[:, 1] + k
            return jnp.where(rowp[:, 3] > 0, row, fine)

        # ---- _bin_one_axis internals
        offs = jnp.cumsum(nc) - nc
        live = nc > 0
        fill = jnp.full((cap,), jnp.int32(-1))
        fill = fill.at[jnp.where(live, offs, cap)].set(
            jnp.arange(t, dtype=jnp.int32), mode="drop")
        t_of_p = jax.lax.cummax(fill, axis=0)
        if stage == "fill":
            return chk(t_of_p)
        t_safe = jnp.maximum(t_of_p, 0)
        rows = jnp.concatenate([tri_cols, nc[:, None], offs[:, None]],
                               axis=1)
        rowp = rows[t_safe]
        if stage == "rowp":
            return chk(rowp)
        k_of_p = jnp.arange(cap, dtype=jnp.int32) - rowp[:, -1]
        pair_live = (t_of_p >= 0) & (k_of_p < rowp[:, -2])
        bin_p = jnp.where(pair_live, combined_bin(rowp, k_of_p), nbins)
        if stage == "binp":
            return chk(bin_p)
        bits = max(2, int(np.ceil(np.log2(nbins + 2))))
        lo_bits = bits // 2
        hi_bits = bits - lo_bits
        packed = (bin_p.astype(jnp.uint32) << 20) | t_safe.astype(jnp.uint32)
        packed = _radix_rank_pass(
            (bin_p & ((1 << lo_bits) - 1)).astype(jnp.int32), packed,
            1 << lo_bits)
        if stage == "radix1":
            return chk(packed.astype(jnp.int32))
        packed = _radix_rank_pass(
            ((packed >> (20 + lo_bits))
             & jnp.uint32((1 << hi_bits) - 1)).astype(jnp.int32),
            packed, 1 << hi_bits)
        if stage == "radix2":
            return chk(packed.astype(jnp.int32))
        sorted_bins = (packed >> 20).astype(jnp.int32)
        tri_of_pair = (packed & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        pair_records = jnp.where((sorted_bins < nbins)[:, None],
                                 records[jnp.minimum(tri_of_pair, t - 1)],
                                 _killed_record(records.shape[1]))
        if stage == "recgather":
            return chk(pair_records)
        blocks = _group_blocks(pair_records)
        starts = jnp.searchsorted(
            sorted_bins, jnp.arange(nbins + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        if stage == "blocks":
            return chk(blocks) + chk(starts)
        binned = raster.bin_triangles(setup, width, height, extra=extra)
        if stage == "fullbin":
            return (chk(binned.pairs) + chk(binned.starts)
                    + chk(binned.gmeta))
        d, i, g, c = raster.rasterize_gbuf(binned, width, height, msaa=True)
        return chk(d) + chk(i.astype(jnp.float32)) + chk(g) + chk(c)

    stages = ["setup", "records", "fill", "rowp", "binp", "radix1",
              "radix2", "recgather", "blocks", "fullbin", "geometry"]

    @jax.jit
    def nop(x):
        return x + 1

    _ = np.asarray(nop(jnp.zeros(4)))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(nop(jnp.zeros(4)))
    floor = (time.perf_counter() - t0) / 5

    prev = 0.0
    for st in stages:
        fn = jax.jit(lambda cb, st=st: jax.lax.scan(
            lambda acc, c: (acc + prefix(st, c), 0.0),
            jnp.float32(0.0), cb)[0])
        _ = np.asarray(fn(consts_batch))      # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(fn(consts_batch))
        dt = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{st:<12} {dt:8.2f} ms/frame   (+{dt - prev:6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
