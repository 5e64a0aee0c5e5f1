"""Screen-space reflections — counterpart of the reference's FFX-SSSR +
DNSR denoiser stack (ScreenSpaceReflectionsPass, 7 CS subpasses: classify
tiles, prepare indirect args, blue-noise, hierarchical intersect, reproject,
prefilter, resolve temporal — ScreenSpaceReflections.h:104-171) and the
ApplyReflections composite (ApplyReflections.hlsl).

TPU-native restructuring: tile classification + indirect dispatch become
dense masked compute (divergence-free); the hierarchical ray march becomes a
fixed-step screen-space march against the SPD depth pyramid with a binary
refinement; DNSR's reproject/prefilter/temporal become dense reprojection +
roughness-scaled blur + exponential history blend.
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
                      num_steps: int = 16, refine_steps: int = 4,
                      max_distance: float = 60.0,
                      thickness: float = 0.6,
                      jitter: bool = True):
    """-> (reflection color [H,W,3], confidence [H,W]).

    scene_color: lit HDR before reflections (the intersect source, like
    SSSR intersecting the scene color); depth: z_ndc; normals: world space.
    jitter offsets each ray's march phase by per-pixel blue noise so the
    fixed step count dithers instead of banding (SSSR's blue-noise jitter);
    the bilateral/temporal denoise integrates the dither away.
    """
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

    # depth mips for acceleration (min depth = closest occluder), built
    # from a 2x-downsampled base: per-step depth fetches gather from this
    # table, and tables under ~1-2 MB hit the fast TPU gather path
    # (measured ~5x faster than multi-MB tables)
    z2 = zv[: (h // 2) * 2, : (w // 2) * 2]
    zbase = z2.reshape(z2.shape[0] // 2, 2, z2.shape[1] // 2, 2).min((1, 3))
    zmips = ffx.spd_mip_pyramid(zbase, num_mips=3, reduce="min")

    valid_px = depth < 1.0

    def sample_depth(uv_x, uv_y, mip: int):
        """Fetch the min-depth mip at a STATIC level: one gather per call
        (per-pixel mip selection would multiply gather cost by the level
        count — TPU gathers run at ~1 element/cycle)."""
        zm = zmips[mip]
        ty = jnp.clip((uv_y * zm.shape[0]).astype(jnp.int32), 0, zm.shape[0] - 1)
        tx = jnp.clip((uv_x * zm.shape[1]).astype(jnp.int32), 0, zm.shape[1] - 1)
        return gather_scalar_rows4(zm.reshape(-1), ty * zm.shape[1] + tx)

    def project(p):
        """view pos -> (u, v, depth) with u,v in [0,1] (y down)."""
        z = jnp.maximum(p[..., 2], 1e-4)
        u = (p[..., 0] / (z * tan_half * aspect)) * 0.5 + 0.5
        v = 0.5 - (p[..., 1] / (z * tan_half)) * 0.5
        return u, v, z

    # fixed-step march with growing step size (hierarchical-ish)
    t_hit = jnp.full((h, w), -1.0)
    step0 = max_distance / (num_steps * 4.0)
    growth = (max_distance / step0) ** (1.0 / num_steps)
    if jitter:
        # phase-jitter the exponential ladder: t0 in [step0, step0*growth)
        # (host-side numpy: the noise is static, no per-pixel pow on device)
        t = jnp.asarray(step0 * growth ** _blue_noise(h, w))
    else:
        t = jnp.full((h, w), step0)
    prev_t = jnp.zeros((h, w))
    for i in range(num_steps):
        p = pos_v + r * t[..., None]
        u, v, z_ray = project(p)
        on_screen = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (p[..., 2] > near)
        mip = min(i // 6, len(zmips) - 1)  # static per step
        z_scene = sample_depth(u, v, mip)
        hit = (z_ray > z_scene) & (z_ray - z_scene < thickness * (1.0 + 0.1 * i)) \
            & on_screen & (t_hit < 0)
        t_hit = jnp.where(hit, t, t_hit)
        prev_t = jnp.where(t_hit < 0, t, prev_t)
        t = t * growth

    # binary refinement between prev step and hit
    lo = jnp.maximum(t_hit / growth, step0)
    hi = jnp.where(t_hit > 0, t_hit, max_distance)
    for _ in range(refine_steps):
        mid = 0.5 * (lo + hi)
        p = pos_v + r * mid[..., None]
        u, v, z_ray = project(p)
        z_scene = sample_depth(u, v, 0)
        crossed = z_ray > z_scene
        hi = jnp.where(crossed, mid, hi)
        lo = jnp.where(crossed, lo, mid)

    t_final = hi
    p = pos_v + r * t_final[..., None]
    u, v, z_ray = project(p)
    ty = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    tx = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    refl = scene_color.reshape(-1, 3)[ty * w + tx]

    # confidence: hit found, facing the camera plane, fade at screen edges
    edge = (jnp.minimum(u, 1 - u).clip(0, 0.1) * 10.0
            * jnp.minimum(v, 1 - v).clip(0, 0.1) * 10.0)
    conf = jnp.where((t_hit > 0) & valid_px, edge, 0.0)
    # reject rays reflecting toward the camera (negative z never intersects
    # reliably in screen space)
    conf = conf * jnp.clip(r[..., 2] * 4.0 + 0.5, 0.0, 1.0)
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


def denoise_reflections(refl: jnp.ndarray, conf: jnp.ndarray,
                        roughness: jnp.ndarray,
                        history: jnp.ndarray | None = None,
                        motion: jnp.ndarray | None = None,
                        temporal_alpha: float = 0.7,
                        depth: jnp.ndarray | None = None):
    """DNSR-style prefilter + temporal resolve
    (the reference's ffx_denoiser_reflections_* pass chain,
    ScreenSpaceReflections.h:104-171):
    - spatial: roughness-scaled blur chain (mip selection)
    - temporal: reproject history by motion vectors, clamp it to the 3x3
      neighborhood color bounds of the current frame (variance clamping —
      stale history outside the local distribution is rejected, killing
      ghosting), gate the blend by depth disocclusion when depth history
      is available, and weight by hit confidence.
    history carries [H,W,4]: rgb + the depth it was resolved at.
    Returns (denoised [H,W,3], new_history [H,W,4])."""
    h, w = refl.shape[:2]
    mips = ffx.spd_mip_pyramid(refl, num_mips=4, reduce="mean")
    # pick blur level by roughness
    out = refl
    lvl = jnp.clip((roughness * 4.0).astype(jnp.int32), 0, len(mips) - 1)
    for m in range(1, len(mips)):
        up = jnp.repeat(jnp.repeat(mips[m], 1 << m, axis=0), 1 << m, axis=1)
        # odd intermediate sizes floor-divide: edge-pad back up to [h, w]
        if up.shape[0] < h or up.shape[1] < w:
            up = jnp.pad(up, ((0, h - up.shape[0]), (0, w - up.shape[1]),
                              (0, 0)), mode="edge")
        up = up[:h, :w]
        out = jnp.where((lvl == m)[..., None], up, out)

    cur_depth = depth if depth is not None else jnp.zeros((h, w), refl.dtype)
    if history is not None:
        if history.shape[-1] == 3:   # legacy rgb-only history
            history = jnp.concatenate(
                [history, jnp.zeros_like(history[..., :1])], axis=-1)
        if motion is not None:
            # reproject: history sampled at prev-frame position
            ys = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
            xs = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
            # motion is ndc delta (curr - prev); prev px = curr - motion*half
            px = xs - motion[..., 0] * (w * 0.5)
            py = ys + motion[..., 1] * (h * 0.5)
            ty = jnp.clip(py.astype(jnp.int32), 0, h - 1)
            tx = jnp.clip(px.astype(jnp.int32), 0, w - 1)
            hist = history.reshape(-1, history.shape[-1])[ty * w + tx]
        else:
            hist = history
        hist_rgb, hist_depth = hist[..., :3], hist[..., 3]
        # variance clamp: history constrained to the local color bounds
        lo, hi = _local_minmax3(out)
        hist_rgb = jnp.clip(hist_rgb, lo, hi)
        # disocclusion: depth mismatch collapses the history weight
        alpha = jnp.asarray(temporal_alpha, refl.dtype)
        if depth is not None:
            zdiff = jnp.abs(hist_depth - cur_depth) \
                / jnp.maximum(jnp.abs(cur_depth), 1e-3)
            alpha = alpha * jnp.clip(1.0 - zdiff * 8.0, 0.0, 1.0)
        alpha = (alpha * jnp.clip(conf * 2.0, 0.25, 1.0))[..., None]
        out = alpha * hist_rgb + (1.0 - alpha) * out
    new_history = jnp.concatenate([out, cur_depth[..., None]], axis=-1)
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
