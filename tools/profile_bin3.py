"""Decompose the live binning cost (bench scene, 1080p): record packing,
fine-tier compaction/radix, row tier, global tier, plus micro-costs of the
radix-rank pass at several bucket widths, the cummax fill, and the
group-block transpose. Run alone — one axon client at a time."""
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

    from vqengine_tpu.ops import culling, raster
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, _ = build_sponza_stress()
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

    def checksum(tree):
        return sum(jnp.sum(jnp.asarray(x, jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree))

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
        print(f"{name:34s} {ms:8.2f} ms/frame", flush=True)
        return ms

    tl = scene.num_tris_live
    tri_item = scene.tri_item[:tl]

    def setup_of(consts):
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)
        return raster.setup_triangles(clip_c, None, width, height,
                                      tri_mask=tri_mask[:tl])

    def extra_of(consts):
        return raster.pack_gbuf_extra_corners(
            scene.corner_normals, scene.corner_tangents, scene.corner_uvs,
            tri_item, consts.normal_mats,
            scene.item_material[tri_item], scene.item_object[tri_item])

    timed("cull+mask only", lambda c: checksum(culling.cull_and_select_lod(
        c.world, scene.aabb_center, scene.aabb_extent,
        c.frustum_planes, c.view_proj, scene.item_num_lods)))
    timed("setup", lambda c: checksum(setup_of(c)))
    timed("setup+extra", lambda c: checksum((setup_of(c), extra_of(c))))
    timed("setup+extra+records", lambda c: checksum(
        raster._pack_records(setup_of(c), extra_of(c))))

    from vqengine_tpu.ops.raster import (GROUP, K_MAX_DEFAULT, TILE_H,
                                         TILE_W, cdiv)

    def bin_partial(consts, do_fine=True, do_row=True):
        setup = setup_of(consts)
        extra = extra_of(consts)
        records = raster._pack_records(setup, extra)
        t = setup.edges9.shape[0]
        tiles_x = cdiv(width, TILE_W)
        tiles_y = cdiv(height, TILE_H)
        nt = tiles_x * tiles_y
        cap = cdiv(t, GROUP) * GROUP
        cap_r = cdiv(max(4096, t // 8), GROUP) * GROUP
        tx0, ty0 = setup.tile_lo[:, 0], setup.tile_lo[:, 1]
        tx1, ty1 = setup.tile_hi[:, 0], setup.tile_hi[:, 1]
        span_w = tx1 - tx0 + 1
        span_h = ty1 - ty0 + 1
        ncover = span_w * span_h
        small = setup.valid & ~setup.big & (ncover <= K_MAX_DEFAULT)
        medium = setup.valid & ~setup.big & (ncover > K_MAX_DEFAULT)
        nc = jnp.where(small, ncover, 0).astype(jnp.int32)
        nc_r = jnp.where(medium, span_h, 0).astype(jnp.int32)
        tri_cols = jnp.stack([tx0, ty0, span_w], axis=1)

        def fine_bin(rowp, k):
            sw = jnp.maximum(rowp[:, 2], 1)
            return (rowp[:, 1] + k // sw) * tiles_x + rowp[:, 0] + k % sw

        def row_bin(rowp, k):
            return rowp[:, 1] + k

        out = []
        if do_fine:
            out.append(raster._bin_one_axis(nc, tri_cols, records, cap, nt,
                                            fine_bin))
        if do_row:
            out.append(raster._bin_one_axis(nc_r, tri_cols, records, cap_r,
                                            tiles_y, row_bin))
        return checksum(out)

    timed("records+fine tier", lambda c: bin_partial(c, True, False))
    timed("records+row tier", lambda c: bin_partial(c, False, True))
    timed("records+fine+row", lambda c: bin_partial(c, True, True))
    timed("bin_triangles full", lambda c: checksum(raster.bin_triangles(
        setup_of(c), width, height, extra=extra_of(c))))

    # micro: primitives at the live cap
    T = int(cdiv(tl, GROUP) * GROUP)
    rng = np.random.default_rng(0)
    payload = jnp.asarray(rng.integers(0, 2**31, T).astype(np.uint32))
    recs = jnp.asarray(rng.random((T, 32)).astype(np.float32))

    def micro(name, fn):
        seeds = jnp.arange(n, dtype=jnp.int32)

        @jax.jit
        def run(seeds):
            def step(c, s):
                return c + fn(s), None
            tot, _ = jax.lax.scan(step, jnp.float32(0.0), seeds)
            return tot

        @jax.jit
        def nop(t):
            return t + 1

        _ = np.asarray(run(seeds))
        t0 = time.perf_counter()
        for _ in range(5):
            _ = np.asarray(nop(jnp.zeros(4)))
        floor = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        _ = np.asarray(run(seeds))
        ms = (time.perf_counter() - t0 - floor) / n * 1e3
        print(f"{name:34s} {ms:8.2f} ms", flush=True)

    for nb in (16, 32, 64, 128):
        def rp(s, nb=nb):
            b = ((payload + s.astype(jnp.uint32)) % nb).astype(jnp.int32)
            return raster._radix_rank_pass(b, payload, nb).sum()
        micro(f"radix pass {nb} buckets [T]", rp)

    def cm(s):
        fill = jnp.full((T,), jnp.int32(-1)).at[payload.astype(jnp.int32)
                                                % T].set(s)
        return jax.lax.cummax(fill, axis=0).sum()
    micro("iota scatter+cummax [T]", cm)

    def gb(s):
        return raster._group_blocks(recs + s.astype(jnp.float32)).sum()
    micro("group_blocks transpose [T,32]", gb)

    def rg(s):
        idx = (payload.astype(jnp.int32) + s) % T
        return recs[idx].sum()
    micro("record gather [T,32]", rg)

    sorted_bins = jnp.sort((payload % 1021).astype(jnp.int32))

    def ss(s):
        return jnp.searchsorted(
            sorted_bins + s * 0, jnp.arange(1022, dtype=jnp.int32),
            side="left").sum().astype(jnp.float32)
    micro("searchsorted [T] x 1022", ss)

    def hist_scatter(s):
        b = ((payload + s.astype(jnp.uint32)) % 1021).astype(jnp.int32)
        h = jnp.zeros((1021,), jnp.int32).at[b].add(1)
        return jnp.cumsum(h).sum().astype(jnp.float32)
    micro("scatter-add hist 1021 + cumsum", hist_scatter)

    # decides the gather-resolve kernel design: per-PIXEL winner-record
    # row fetch from the [cap, 32] f32 table (36 MB — well off the
    # small-table fast path, but row gathers are fetch-count-bound)
    pix = 1920 * 1080
    pidx = jnp.asarray(rng.integers(0, T, pix).astype(np.int32))

    def rg2m(s):
        return recs[(pidx + s) % T].sum()
    micro("record row gather [2M px, 32]", rg2m)

    def rg2m_half(s):
        return recs[(pidx[: pix // 4] + s) % T].sum()
    micro("record row gather [0.5M px, 32]", rg2m_half)

    def binp(s):
        sw = jnp.maximum((payload % 15).astype(jnp.int32), 1)
        k = ((payload >> 4) % 16).astype(jnp.int32) + s * 0
        q = jnp.floor((k.astype(jnp.float32) + 0.5)
                      / sw.astype(jnp.float32)).astype(jnp.int32)
        return ((q * 15) + (k - q * sw)).sum().astype(jnp.float32)
    micro("fine bin compute (float div)", binp)


if __name__ == "__main__":
    main()
