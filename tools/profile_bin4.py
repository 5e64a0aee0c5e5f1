"""Round-5: decompose bin_triangles (+28.3 ms/frame, THE largest stage —
tools/profile_r5g.py row 'bin') into cumulative rows on the REAL bench
scene. Each row adds one internal stage of ops/raster.py's
_bin_one_axis pipeline; deltas attribute the block:

  records    front_end + _pack_records (the [T, 32] record build)
  pairfill   + nc/offs scatter + cummax fill + rowp gather + bin compute
  radix1     + first stable radix-rank pass (32 buckets)
  radix2     + second pass (64 buckets)
  recgather  + pair_records killed-masked row gather [cap, 32]
  binfull    full bin_triangles (adds _group_blocks transpose + starts)
  cap<N>     full bin_triangles at a reduced pair_capacity (cap economics)

Also prints the MEASURED pair demand (nc sum / small / medium counts)
over the 16-camera sweep so caps can be sized to demand, not T.

Run ALONE on the TPU (one axon client; no CPU-heavy work concurrently).
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

    from vqengine_tpu.ops import culling, raster
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    width, height = 1920, 1080
    buffers, lights, textures = build_sponza_stress()
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
        floors = []
        for _ in range(7):
            t0 = time.perf_counter()
            _ = np.asarray(nop(jnp.zeros(4)))
            floors.append(time.perf_counter() - t0)
        floor = float(np.median(floors))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run_n(consts_batch))
            best = min(best, time.perf_counter() - t0)
        ms = (best - floor) / n * 1e3
        print(f"{name:34s} {ms:8.2f} ms/frame", flush=True)
        return ms

    tl = int(scene.num_tris_live)

    def front_end(consts):
        visible, lod = culling.cull_and_select_lod(
            consts.world, scene.aabb_center, scene.aabb_extent,
            consts.frustum_planes, consts.view_proj, scene.item_num_lods)
        tri_mask = culling.triangle_mask_from_items(
            scene.tri_item, scene.tri_lod, visible, lod)
        wvp = jnp.einsum("ij,njk->nik", consts.view_proj, consts.world)
        tri_item = scene.tri_item[:tl]
        clip_c = raster.transform_clip_corners(
            scene.corner_positions, tri_item, wvp)
        cn, ct, cu = (scene.corner_normals, scene.corner_tangents,
                      scene.corner_uvs)
        tri_mask_c = tri_mask[:tl]
        clip_c, cn, ct, cu, tri_item, tri_mask_c = \
            graph.append_amplified_patches(scene, consts, visible, wvp,
                                           clip_c, cn, ct, cu, tri_item,
                                           tri_mask_c)
        setup = raster.setup_triangles(clip_c, None, width, height,
                                       tri_mask=tri_mask_c)
        extra = raster.pack_gbuf_extra_corners(
            cn, ct, cu, tri_item, consts.normal_mats,
            scene.item_material[tri_item], scene.item_object[tri_item])
        return setup, extra

    # --- replicate bin_triangles internals (keep in sync with raster.py) --
    tiles_x = raster.cdiv(width, raster.TILE_W)
    tiles_y = raster.cdiv(height, raster.TILE_H)
    nt = tiles_x * tiles_y
    k_max = raster.K_MAX_DEFAULT

    def mids(setup):
        tx0, ty0 = setup.tile_lo[:, 0], setup.tile_lo[:, 1]
        tx1, ty1 = setup.tile_hi[:, 0], setup.tile_hi[:, 1]
        span_w = tx1 - tx0 + 1
        span_h = ty1 - ty0 + 1
        ncover = span_w * span_h
        small = setup.valid & ~setup.big & (ncover <= k_max)
        medium = setup.valid & ~setup.big & (ncover > k_max)
        nc_all = jnp.where(small, ncover,
                           jnp.where(medium, span_h, 0)).astype(jnp.int32)
        tri_cols = jnp.stack([tx0, ty0, span_w,
                              medium.astype(jnp.int32)], axis=1)
        return nc_all, tri_cols, small, medium

    def compute_bin(rowp, k):
        sw = jnp.maximum(rowp[:, 2], 1)
        q = jnp.floor((k.astype(jnp.float32) + 0.5)
                      / sw.astype(jnp.float32)).astype(jnp.int32)
        fine = (rowp[:, 1] + q) * tiles_x + rowp[:, 0] + (k - q * sw)
        row = nt + rowp[:, 1] + k
        return jnp.where(rowp[:, 3] > 0, row, fine)

    def stage(consts, upto):
        setup, extra = front_end(consts)
        records = raster._pack_records(setup, extra)
        if upto == "records":
            return records.sum()
        nc, tri_cols, _, _ = mids(setup)
        t = nc.shape[0]
        cap = (max(raster.GROUP, min(t, 4 * 1024 * 1024))
               + max(8192, t // 4))
        cap = raster.cdiv(cap, raster.GROUP) * raster.GROUP
        nbins = nt + tiles_y
        offs = jnp.cumsum(nc) - nc
        live = nc > 0
        fill = jnp.full((cap,), jnp.int32(-1))
        fill = fill.at[jnp.where(live, offs, cap)].set(
            jnp.arange(t, dtype=jnp.int32), mode="drop")
        t_of_p = jax.lax.cummax(fill, axis=0)
        t_safe = jnp.maximum(t_of_p, 0)
        rows = jnp.concatenate([tri_cols, nc[:, None], offs[:, None]],
                               axis=1)
        rowp = rows[t_safe]
        k_of_p = jnp.arange(cap, dtype=jnp.int32) - rowp[:, -1]
        pair_live = (t_of_p >= 0) & (k_of_p < rowp[:, -2])
        bin_p = jnp.where(pair_live, compute_bin(rowp, k_of_p), nbins)
        if upto == "pairfill":
            return records.sum() + bin_p.sum().astype(jnp.float32)
        bits = max(2, int(np.ceil(np.log2(nbins + 2))))
        lo_bits = bits // 2
        hi_bits = bits - lo_bits
        packed = (bin_p.astype(jnp.uint32) << 20) | t_safe.astype(jnp.uint32)
        packed = raster._radix_rank_pass(
            (bin_p & ((1 << lo_bits) - 1)).astype(jnp.int32), packed,
            1 << lo_bits)
        if upto == "radix1":
            return records.sum() + packed.sum().astype(jnp.float32)
        packed = raster._radix_rank_pass(
            ((packed >> (20 + lo_bits))
             & jnp.uint32((1 << hi_bits) - 1)).astype(jnp.int32),
            packed, 1 << hi_bits)
        if upto == "radix2":
            return records.sum() + packed.sum().astype(jnp.float32)
        sorted_bins = (packed >> 20).astype(jnp.int32)
        tri_of_pair = (packed & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        pair_records = jnp.where(
            (sorted_bins < nbins)[:, None],
            records[jnp.minimum(tri_of_pair, t - 1)],
            raster._killed_record(records.shape[1]))
        if upto == "recgather":
            return pair_records.sum()
        raise ValueError(upto)

    def f_binfull(consts, cap=None):
        setup, extra = front_end(consts)
        binned = raster.bin_triangles(setup, width, height, extra=extra,
                                      pair_capacity=cap)
        return (binned.pairs.sum() + binned.starts.sum().astype(jnp.float32)
                + binned.rstarts.sum().astype(jnp.float32))

    which = set(sys.argv[1:]) or {"demand", "stages", "caps"}

    if "demand" in which:
        @jax.jit
        def demand(consts):
            setup, _ = front_end(consts)
            nc, _, small, medium = mids(setup)
            return (nc.sum(), small.sum(), medium.sum(),
                    jnp.where(medium, nc, 0).sum())
        tot = small_n = med_n = med_pairs = 0
        for i in range(n):
            ci = jax.tree_util.tree_map(lambda x: x[i], consts_batch)
            d = [int(np.asarray(v)) for v in demand(ci)]
            tot = max(tot, d[0])
            small_n, med_n = max(small_n, d[1]), max(med_n, d[2])
            med_pairs = max(med_pairs, d[3])
        t = int(scene.num_tris_live)
        cap = (max(raster.GROUP, min(t, 4 * 1024 * 1024))
               + max(8192, t // 4))
        print(f"pair demand max {tot} (small tris {small_n}, medium "
              f"{med_n} -> {med_pairs} row pairs); cap {cap} "
              f"({tot / cap:.2f} used)", flush=True)

    if "stages" in which:
        timed("records (pack only)", lambda c: stage(c, "records"))
        timed("+ pair fill + bin ids", lambda c: stage(c, "pairfill"))
        timed("+ radix pass 1", lambda c: stage(c, "radix1"))
        timed("+ radix pass 2", lambda c: stage(c, "radix2"))
        timed("+ record gather", lambda c: stage(c, "recgather"))
        timed("bin full (blocks+starts)", f_binfull)

    if "caps" in which:
        for frac in (2, 3):
            t = int(scene.num_tris_live)
            cap = t // frac + 16384
            timed(f"bin full cap=T/{frac}+16k",
                  lambda c, cap=cap: f_binfull(c, cap))


if __name__ == "__main__":
    main()
