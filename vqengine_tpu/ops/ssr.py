"""Screen-space reflections — counterpart of the reference's FFX-SSSR +
DNSR denoiser stack (ScreenSpaceReflectionsPass, 7 CS subpasses: classify
tiles, prepare indirect args, blue-noise, hierarchical intersect, reproject,
prefilter, resolve temporal — ScreenSpaceReflections.h:104-171) and the
ApplyReflections composite (ApplyReflections.hlsl).

TPU-native restructuring: tile classification + indirect dispatch become
dense masked compute (divergence-free); the hierarchical ray march is a
true hi-Z DDA (the SSSR intersect pass's traversal, ffx_sssr.h): the ray
is a screen-space segment with affine 1/z, each iteration steps to the
current mip cell's exit boundary, descends a level when the ray dips under
the cell's min depth, ascends after safe cells, and solves the exact
level-0 intersection — all pixels advance in lockstep with per-pixel
dynamic levels (index arithmetic over the flattened pyramid). DNSR's
reproject/prefilter/temporal become dense reprojection + roughness-scaled
blur + variance-clamped, disocclusion-gated history blend.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import ffx
from .brdf import _pow5
from .ssao import gather_scalar_rows4, view_depth_from_ndc


def _reconstruct_view_pos(depth_v: jnp.ndarray, fov_y, aspect) -> jnp.ndarray:
    h, w = depth_v.shape
    tan_half = jnp.tan(fov_y * 0.5)
    ndc_x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ndc_y = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    vx = ndc_x[None, :] * tan_half * aspect * depth_v
    vy = ndc_y[:, None] * tan_half * depth_v
    return jnp.stack([vx, vy, depth_v], axis=-1)


def _blue_noise(h: int, w: int) -> np.ndarray:
    """Tileable low-discrepancy per-pixel jitter in [0,1) — the R2 sequence
    over pixel coordinates (the counterpart of SSSR's blue-noise sampler
    texture, ScreenSpaceReflections.h:118-122)."""
    g = 1.32471795724474602596  # plastic constant
    a1, a2 = 1.0 / g, 1.0 / (g * g)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    return ((a1 * xs + a2 * ys) % 1.0).astype(np.float32)


def trace_reflections(scene_color: jnp.ndarray, depth: jnp.ndarray,
                      normals_world: jnp.ndarray, view: jnp.ndarray,
                      proj_params: jnp.ndarray,
                      num_steps: int = 14, refine_steps: int = 0,
                      max_distance: float = 60.0,
                      thickness: float = 0.6,
                      jitter: bool = True,
                      ray_weight: jnp.ndarray | None = None,
                      ray_frac: int | None = None,
                      telemetry: dict | None = None):
    """-> (reflection color [H,W,3], confidence [H,W]).

    Hi-Z DDA march (the FFX-SSSR intersect traversal, ffx_sssr.h
    HierarchicalRaymarch): the reflected ray projects to a screen-space
    segment along which 1/z_view is affine; each of `num_steps` lockstep
    iterations steps the ray to its current mip cell's exit boundary,
    descends a level when the ray passes under that cell's min depth,
    ascends after a safe cell, and at level 0 solves the exact parameter
    where ray depth meets the surface. Rays that would pass more than
    `thickness` view-units behind a level-0 cell skip it (thin-occluder
    rejection). `refine_steps` is accepted for API compatibility (the
    exact level-0 solve replaces binary refinement). jitter offsets each
    ray's start by per-pixel blue noise (SSSR's blue-noise phase).

    ray_frac enables RAY COMPACTION — the TPU-native counterpart of
    SSSR's tile classification + indirect dispatch
    (ScreenSpaceReflections.h:104-171 ClassifyTiles/PrepareIndirectArgs):
    only rays that can contribute march (valid surface, not reflecting
    into the camera, and ray_weight > 1e-3 when given — the composite's
    gloss weight zeroes roughness >= 0.707 pixels entirely), compacted to
    a [H*W/ray_frac] flat list so every DDA-step gather costs its share
    of the frame instead of 100%. Rays past the capacity fall back to
    conf 0 (no reflection) in raster order. None = dense (every pixel).

    scene_color: lit HDR before reflections (the intersect source);
    depth: z_ndc; normals: world space; ray_weight: optional [H,W]
    composite weight upper bound used only for classification.
    """
    del refine_steps
    h, w = depth.shape
    near, far = proj_params[0], proj_params[1]
    fov_y, aspect = proj_params[2], proj_params[3]
    tan_half = jnp.tan(fov_y * 0.5)

    zv = view_depth_from_ndc(depth, near, far)
    pos_v = _reconstruct_view_pos(zv, fov_y, aspect)
    n_v = jnp.einsum("ij,hwj->hwi", view[:3, :3], normals_world)

    view_dir = pos_v / jnp.maximum(
        jnp.linalg.norm(pos_v, axis=-1, keepdims=True), 1e-6)
    r = view_dir - 2.0 * (view_dir * n_v).sum(-1, keepdims=True) * n_v

    # min-depth mip pyramid from a 2x-downsampled base (tables under
    # ~1-2 MB hit the fast TPU gather path); flattened so the per-pixel
    # DYNAMIC level fetch is one gather + index arithmetic
    z2 = zv[: (h // 2) * 2, : (w // 2) * 2]
    zbase = z2.reshape(z2.shape[0] // 2, 2, z2.shape[1] // 2, 2).min((1, 3))
    zmips = ffx.spd_mip_pyramid(zbase, num_mips=4, reduce="min")
    nlev = len(zmips)
    zflat_parts, zoffs = [], []
    off = 0
    for zm in zmips:
        zflat_parts.append(zm.reshape(-1))
        zoffs.append(off)
        off += zflat_parts[-1].shape[0]
    zflat = jnp.concatenate(zflat_parts)
    dims = [(zm.shape[0], zm.shape[1]) for zm in zmips]

    valid_px = depth < 1.0
    facing = jnp.clip(r[..., 2] * 4.0 + 0.5, 0.0, 1.0)
    jn_img = jnp.asarray(_blue_noise(h, w)) if jitter \
        else jnp.full((h, w), 0.5)

    def project(p):
        """view pos -> (u, v in [0,1] y-down, 1/z)."""
        z = jnp.maximum(p[..., 2], 1e-4)
        u = (p[..., 0] / (z * tan_half * aspect)) * 0.5 + 0.5
        v = 0.5 - (p[..., 1] / (z * tan_half)) * 0.5
        return u, v, 1.0 / z

    def march(pos_r, r_r, valid_r, facing_r, jn_r):
        """The DDA over rays of ANY shape — dense images pass [H,W]
        planes, the compacted path passes flat [CAP] arrays (every
        per-step cell gather then costs the active-ray share)."""
        shape = pos_r.shape[:-1]
        # screen-space segment: clip the view-space endpoint against
        # z = near so the projection stays in front of the camera
        z0 = pos_r[..., 2]
        rz = r_r[..., 2]
        t_clip = jnp.where(rz < -1e-6, (near - z0) / jnp.where(
            rz < -1e-6, rz, -1.0), max_distance)
        t1 = jnp.clip(t_clip, 1e-3, max_distance)
        p1 = pos_r + r_r * t1[..., None]
        u0, v0, w0 = project(pos_r)
        u1, v1, w1 = project(p1)
        du, dv, dw = u1 - u0, v1 - v0, w1 - w0

        # s_end: where the segment leaves the [0,1]^2 screen box (or s=1)
        big = jnp.float32(4.0)

        def exit_s(o, d):
            d_safe = jnp.where(jnp.abs(d) > 1e-9, d, 1e-9)
            sa = (0.0 - o) / d_safe
            sb = (1.0 - o) / d_safe
            return jnp.where(jnp.abs(d) > 1e-9, jnp.maximum(sa, sb), big)

        s_end = jnp.minimum(jnp.minimum(exit_s(u0, du), exit_s(v0, dv)),
                            jnp.float32(1.0))

        du_s = jnp.where(jnp.abs(du) > 1e-9, du, 1e-9)
        dv_s = jnp.where(jnp.abs(dv) > 1e-9, dv, 1e-9)
        stepx = (du >= 0).astype(jnp.float32)
        stepy = (dv >= 0).astype(jnp.float32)

        # start just past the ray's own pixel, phase-jittered by noise
        base_h, base_w = dims[0]
        s_pix = 1.0 / jnp.maximum(
            jnp.maximum(jnp.abs(du) * base_w, jnp.abs(dv) * base_h), 1e-6)
        s = s_pix * (0.55 + 0.9 * jn_r)

        lvl = jnp.zeros(shape, jnp.int32)
        s_hit = jnp.full(shape, -1.0)
        done = s >= s_end
        eps = 1e-5

        for _ in range(num_steps):
            ux = u0 + s * du
            uy = v0 + s * dv
            # per-ray dynamic level: cell index, exit boundary, and the
            # flattened-pyramid fetch index via static-level where-chains
            idx = jnp.zeros(shape, jnp.int32)
            bx = jnp.zeros(shape, jnp.float32)
            by = jnp.zeros(shape, jnp.float32)
            for m, (mh, mw) in enumerate(dims):
                cx = jnp.clip(jnp.floor(ux * mw), 0.0, mw - 1.0)
                cy = jnp.clip(jnp.floor(uy * mh), 0.0, mh - 1.0)
                hitm = lvl == m
                idx = jnp.where(hitm,
                                zoffs[m] + (cy * mw + cx).astype(jnp.int32),
                                idx)
                bx = jnp.where(hitm, (cx + stepx) / mw, bx)
                by = jnp.where(hitm, (cy + stepy) / mh, by)
            z_cell = gather_scalar_rows4(zflat, idx)

            s_exit = jnp.minimum((bx - u0) / du_s, (by - v0) / dv_s) + eps
            s_exit = jnp.maximum(s_exit, s + eps)      # always progress
            s_stop = jnp.minimum(s_exit, s_end)

            w_cur = w0 + s * dw
            w_stop = w0 + s_stop * dw
            z_cur = 1.0 / jnp.maximum(w_cur, 1e-6)
            z_stop = 1.0 / jnp.maximum(w_stop, 1e-6)
            z_far = jnp.maximum(z_cur, z_stop)

            crossing = z_far >= z_cell
            at0 = lvl == 0
            behind = z_cur > z_cell + thickness * (1.0 + 0.04 * z_cell)
            hit_now = crossing & at0 & ~behind & ~done
            # exact level-0 intersection parameter: w(s*) = 1/z_cell
            s_star = (1.0 / jnp.maximum(z_cell, 1e-4) - w0) / jnp.where(
                jnp.abs(dw) > 1e-9, dw, 1e-9)
            s_star = jnp.clip(s_star, s, s_stop)
            s_hit = jnp.where(hit_now, s_star, s_hit)
            done = done | hit_now

            descend = crossing & ~at0 & ~done
            advance = (~crossing | (at0 & behind)) & ~done
            lvl = jnp.where(descend, lvl - 1,
                            jnp.where(advance,
                                      jnp.minimum(lvl + 1, nlev - 1),
                                      lvl))
            s = jnp.where(advance, s_stop, s)
            done = done | (s >= s_end)

        hit = s_hit > 0
        s_f = jnp.where(hit, s_hit, s_end)
        u = u0 + s_f * du
        v = v0 + s_f * dv
        ty = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
        tx = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
        refl = scene_color.reshape(-1, 3)[ty * w + tx]

        # confidence: hit found, facing the camera, fade at screen edges;
        # rays reflecting toward the camera (negative z) never intersect
        # reliably in screen space
        edge = (jnp.minimum(u, 1 - u).clip(0, 0.1) * 10.0
                * jnp.minimum(v, 1 - v).clip(0, 0.1) * 10.0)
        conf = jnp.where(hit & valid_r, edge, 0.0) * facing_r
        return refl, conf

    if ray_frac is None:
        return march(pos_v, r, valid_px, facing, jn_img)

    # ray compaction (SSSR ClassifyTiles + indirect dispatch, TPU-style)
    from . import sparse
    active = valid_px & (facing > 0.0)
    if ray_weight is not None:
        active = active & (ray_weight > 1e-3)
    cap = -(-max(1024, (h * w) // ray_frac) // 8) * 8
    # element compaction: the quarter-res source's full-N scatter is
    # ~1 ms, and block mode measured a net LOSS on the anchor (r4b A/B;
    # block=8 only pays at 2M-element sources)
    idx, count, demand = sparse.compact_indices(active, cap)
    if telemetry is not None:
        telemetry["ssr_rays"] = demand.astype(jnp.float32) / cap
    live = (jnp.arange(cap) < count) & sparse.gather_pixels(active, idx)
    refl_c, conf_c = march(sparse.gather_pixels(pos_v, idx),
                           sparse.gather_pixels(r, idx),
                           live,
                           sparse.gather_pixels(facing, idx),
                           sparse.gather_pixels(jn_img, idx))
    refl = sparse.scatter_pixels(jnp.zeros((h, w, 3), scene_color.dtype),
                                 idx, refl_c, live)
    conf = sparse.scatter_pixels(jnp.zeros((h, w), jnp.float32),
                                 idx, conf_c, live)
    return refl, conf


def _local_minmax3(x: jnp.ndarray):
    """3x3 neighborhood min/max of [H, W, C] via clamped-edge shifts."""
    def shifts(a, axis):
        n = a.shape[axis]
        lead = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        tail = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
        down = jnp.concatenate(
            [lead, jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)], axis=axis)
        up = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, n, axis=axis), tail], axis=axis)
        return down, up
    d0, u0 = shifts(x, 0)
    lo = jnp.minimum(jnp.minimum(x, d0), u0)
    hi = jnp.maximum(jnp.maximum(x, d0), u0)
    d1, u1 = shifts(lo, 1)
    lo = jnp.minimum(jnp.minimum(lo, d1), u1)
    d1, u1 = shifts(hi, 1)
    hi = jnp.maximum(jnp.maximum(hi, d1), u1)
    return lo, hi


def _local_moments3(x: jnp.ndarray):
    """Separable 3x3 box mean and variance of [H, W, C] (the DNSR resolve
    pass's local statistics for variance clipping)."""
    def box(a, axis):
        n = a.shape[axis]
        lead = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        tail = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
        down = jnp.concatenate(
            [lead, jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)], axis=axis)
        up = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, n, axis=axis), tail], axis=axis)
        return (down + a + up) / 3.0
    m1 = box(box(x, 0), 1)
    m2 = box(box(x * x, 0), 1)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    return m1, var


# history channel layout (the DNSR ping-pong buffers collapsed into one
# tensor): rgb | depth | temporal luminance mean | temporal luminance
# second moment | accumulated sample count
HISTORY_CHANNELS = 7


def _luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb * jnp.asarray([0.299, 0.587, 0.114])).sum(-1)


def init_history(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zero history for a scan carry / first frame: [h, w, 7] with zero
    sample count (nothing accumulated). h/w are the SSR half-resolution
    (render_forward traces at half res)."""
    return jnp.zeros((h, w, HISTORY_CHANNELS), dtype)


def denoise_reflections(refl: jnp.ndarray, conf: jnp.ndarray,
                        roughness: jnp.ndarray,
                        history: jnp.ndarray | None = None,
                        motion: jnp.ndarray | None = None,
                        temporal_alpha: float = 0.7,
                        depth: jnp.ndarray | None = None,
                        y_offset: "jnp.ndarray | int" = 0,
                        full_height: int | None = None):
    """DNSR-style prefilter + temporal resolve
    (the reference's ffx_denoiser_reflections_* pass chain,
    ScreenSpaceReflections.h:104-171):
    - spatial: roughness-scaled blur chain (mip selection)
    - temporal: reproject history by motion vectors, clamp it to the 3x3
      neighborhood color bounds of the current frame (variance clamping —
      stale history outside the local distribution is rejected, killing
      ghosting), gate the blend by depth disocclusion when depth history
      is available, and weight by hit confidence.
    history carries HISTORY_CHANNELS = 7 floats/pixel: rgb | depth it was
    resolved at | temporal luminance mean | temporal luminance second
    moment | accumulated sample count (the reference's separate radiance /
    variance / sample-count ping-pong buffers collapsed into one tensor).
    3- or 4-channel histories (older callers) zero-pad: zero sample count
    = "no accumulated history", so they bootstrap correctly.
    Returns (denoised [H,W,3], new_history [H,W,7]).

    Band sharding (parallel/multichip.py): refl/conf/... are one band of
    `full_height` rows starting at global row y_offset, while `history` is
    the FULL-frame table (all_gathered — reprojection can cross bands);
    the returned new_history stays band-local."""
    h, w = refl.shape[:2]
    mips = ffx.spd_mip_pyramid(refl, num_mips=4, reduce="mean")

    cur_depth = depth if depth is not None else jnp.zeros((h, w), refl.dtype)
    hist = None
    if history is not None:
        c = history.shape[-1]
        if c < HISTORY_CHANNELS:
            history = jnp.concatenate(
                [history, jnp.zeros(history.shape[:-1]
                                    + (HISTORY_CHANNELS - c,),
                                    history.dtype)], axis=-1)
        hf = full_height if full_height is not None else h
        if motion is not None:
            # reproject: history sampled at prev-frame position (global
            # frame rows — the history table spans the full frame)
            ys = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
                  + y_offset)
            xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
            # motion is ndc delta (curr - prev); prev px = curr - motion*half
            px = xs - motion[..., 0] * (w * 0.5)
            py = ys + motion[..., 1] * (hf * 0.5)
            ty = jnp.clip(py.astype(jnp.int32), 0, hf - 1)
            tx = jnp.clip(px.astype(jnp.int32), 0, w - 1)
            hist = history.reshape(-1, history.shape[-1])[ty * w + tx]
        elif full_height is not None:
            hist = jax.lax.dynamic_slice_in_dim(
                history, jnp.asarray(y_offset, jnp.int32), h, 0)
        else:
            hist = history

    # spatial prefilter: blur level from roughness, WIDENED where the
    # tracked temporal variance is high (the DNSR resolve's
    # variance-guided kernel: noisy regions trade detail for stability)
    lvl_f = roughness * 4.0
    if hist is not None:
        tvar = jnp.maximum(hist[..., 5] - hist[..., 4] ** 2, 0.0)
        lvl_f = lvl_f + jnp.clip(tvar * 8.0, 0.0, 1.5)
    out = refl
    lvl = jnp.clip(lvl_f.astype(jnp.int32), 0, len(mips) - 1)
    for m in range(1, len(mips)):
        up = jnp.repeat(jnp.repeat(mips[m], 1 << m, axis=0), 1 << m, axis=1)
        # odd intermediate sizes floor-divide: edge-pad back up to [h, w]
        if up.shape[0] < h or up.shape[1] < w:
            up = jnp.pad(up, ((0, h - up.shape[0]), (0, w - up.shape[1]),
                              (0, 0)), mode="edge")
        up = up[:h, :w]
        out = jnp.where((lvl == m)[..., None], up, out)

    lum_cur = _luminance(out)
    if hist is not None:
        hist_rgb, hist_depth = hist[..., :3], hist[..., 3]
        hist_mu, hist_m2 = hist[..., 4], hist[..., 5]
        hist_n = hist[..., 6]
        # disocclusion: depth mismatch RESETS the accumulation (sample
        # count collapses -> history weight collapses), the reference's
        # ffx_denoiser_reflections_reproject disocclusion test
        keep = jnp.ones((h, w), refl.dtype)
        if depth is not None:
            zdiff = jnp.abs(hist_depth - cur_depth) \
                / jnp.maximum(jnp.abs(cur_depth), 1e-3)
            keep = jnp.clip(1.0 - zdiff * 8.0, 0.0, 1.0)
        trust = (hist_n * keep > 0.5).astype(refl.dtype)  # moments valid
        # only once at least one accumulated frame backs them
        sigma = jnp.sqrt(jnp.maximum(hist_m2 - hist_mu ** 2, 0.0))
        # temporal consistency test: the current sample is a fresh draw
        # from the surface's reflection distribution — if it lands far
        # outside the history's tracked mu +- 1.25 sigma, the surface
        # changed or the reprojection grabbed the wrong surface (ghosts
        # the depth test misses: parallax pans at constant depth) -> the
        # accumulation resets, like a disocclusion
        excess = jnp.maximum(
            jnp.abs(lum_cur - hist_mu) - 1.25 * sigma - 0.05, 0.0)
        keep = keep * jnp.where(
            trust > 0, jnp.clip(1.0 - excess * 4.0, 0.0, 1.0), 1.0)
        n = hist_n * keep
        # spatial neighborhood clamp: history constrained to the local
        # color bounds of the current frame
        lo, hi = _local_minmax3(out)
        hist_rgb = jnp.clip(hist_rgb, lo, hi)
        # history self-consistency clamp (DOWN-scale only, never
        # amplify): history radiance brighter than its own tracked
        # distribution allows is a ghost blended in from elsewhere —
        # e.g. a bright blob inside the WIDE spatial bounds near a
        # specular highlight, where the min/max clamp cannot catch it
        ghost_lum = _luminance(hist_rgb)
        bound = hist_mu + 1.25 * sigma + 0.02
        scale = jnp.minimum(
            1.0, bound / jnp.maximum(ghost_lum, 1e-6))
        hist_rgb = hist_rgb * jnp.where(trust > 0, scale, 1.0)[..., None]
        # sample-count-ramped accumulation: weight grows n/(n+1) toward
        # temporal_alpha as evidence accumulates (a 1-frame-old history
        # is not trusted like a 30-frame one), scaled by hit confidence
        n_new = jnp.minimum(n + 1.0, 32.0)
        alpha = jnp.asarray(temporal_alpha, refl.dtype) * (n / n_new)
        alpha = (alpha * jnp.clip(conf * 2.0, 0.25, 1.0))[..., None]
        out = alpha * hist_rgb + (1.0 - alpha) * out
        # temporal luminance moments track the RESOLVED signal
        a1 = alpha[..., 0]
        lum_out = _luminance(out)
        mu_new = jnp.where(trust > 0,
                           a1 * hist_mu + (1 - a1) * lum_out, lum_out)
        m2_new = jnp.where(trust > 0,
                           a1 * hist_m2 + (1 - a1) * lum_out ** 2,
                           lum_out ** 2)
    else:
        n_new = jnp.ones((h, w), refl.dtype)
        mu_new, m2_new = lum_cur, lum_cur ** 2
    new_history = jnp.concatenate(
        [out, cur_depth[..., None], mu_new[..., None], m2_new[..., None],
         n_new[..., None]], axis=-1)
    return out, new_history


def apply_reflections(scene_color: jnp.ndarray, refl: jnp.ndarray,
                      conf: jnp.ndarray, roughness: jnp.ndarray,
                      metalness: jnp.ndarray, albedo: jnp.ndarray,
                      normals: jnp.ndarray, view_dir: jnp.ndarray):
    """Composite (ApplyReflections.hlsl): blend the denoised radiance in
    with a Fresnel-and-roughness weight."""
    f0 = 0.04 + (albedo - 0.04) * metalness[..., None]
    ndotv = jnp.clip((normals * view_dir).sum(-1), 0.0, 1.0)
    fres = f0 + (jnp.maximum(1.0 - roughness[..., None], f0) - f0) \
        * _pow5(1.0 - ndotv)[..., None]
    gloss = jnp.clip(1.0 - roughness * roughness * 2.0, 0.0, 1.0)
    wgt = fres * (conf * gloss)[..., None]
    return scene_color + refl * wgt
