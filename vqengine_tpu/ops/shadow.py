"""Shadow maps + PCF — counterpart of the reference shadow path:
ShadowDepthPass.hlsl (depth-only render; point lights store linear radial
distance / far), Lighting.hlsl shadow tests (:89-174 omnidirectional 20-tap
PCF, :177-218 spot 5x5 PCF, :222-272 directional 5x5 PCF), and the shadow
map budget (5 spot x1024^2, 5 point x6x1024^2 cube, 1 directional x2048^2 —
Renderer.cpp:520-522).

Shadow map rendering reuses the tile rasterizer depth-only; the PCF tests
evaluate densely over the main view's G-buffer and produce per-caster
visibility maps consumed by ops/shading.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import raster

# reference resolutions (Renderer.cpp:520-522)
SPOT_SHADOW_DIM = 1024
POINT_SHADOW_DIM = 1024
DIRECTIONAL_SHADOW_DIM = 2048

# 20 normalized omnidirectional PCF tap directions (Lighting.hlsl:120-133)
_F3 = 0.5773502691896258
_F2 = 0.7071067811865475
OMNI_TAPS = jnp.asarray([
    [_F3, _F3, _F3], [_F3, -_F3, _F3], [-_F3, -_F3, _F3], [-_F3, _F3, _F3],
    [_F3, _F3, -_F3], [_F3, -_F3, -_F3], [-_F3, -_F3, -_F3], [-_F3, _F3, -_F3],
    [_F2, _F2, 0], [_F2, -_F2, 0], [-_F2, -_F2, 0], [-_F2, _F2, 0],
    [_F2, 0, _F2], [-_F2, 0, _F2], [_F2, 0, -_F2], [-_F2, 0, -_F2],
    [0, _F2, _F2], [0, -_F2, _F2], [0, -_F2, -_F2], [0, _F2, -_F2],
], dtype=jnp.float32)


# ---------------------------------------------------------------------------
# shadow map rendering (depth-only raster)
# ---------------------------------------------------------------------------

def render_shadow_depth(positions: jnp.ndarray, item_of_vertex: jnp.ndarray,
                        world: jnp.ndarray, light_vp: jnp.ndarray,
                        indices: jnp.ndarray, size: int,
                        tri_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Depth-only render from a light: -> z_ndc depth map [size, size].
    (RenderSpotShadowMaps / RenderDirectionalShadowMaps driver,
    SceneRendering.cpp:1114-1263, minus the command-list machinery.)"""
    wvp = jnp.einsum("ij,njk->nik", light_vp, world)
    clip = raster.transform_clip_instanced(positions, item_of_vertex, wvp)
    setup = raster.setup_triangles(clip, indices, size, size, tri_mask=tri_mask)
    binned = raster.bin_triangles(setup, size, size)
    depth, _ = raster.rasterize(binned, size, size)
    return depth


def ndc_depth_to_radial(depth: jnp.ndarray, near: float, far: float) -> jnp.ndarray:
    """Convert a 90-deg-fov face's z_ndc map to linear radial distance / far
    (the point-light ShadowDepthPass.hlsl stores dist(P, light)/far).

    z_view = n*f / (f - z*(f-n)); radial = z_view * sqrt(1 + u^2 + v^2)
    with (u, v) the NDC coords of each texel."""
    s = depth.shape[0]
    uv = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * 2.0 - 1.0
    u = uv[None, :]
    v = -uv[:, None]  # screen y down -> ndc y up
    denom = jnp.maximum(far - depth * (far - near), 1e-9)
    z_view = near * far / denom
    radial = z_view * jnp.sqrt(1.0 + u * u + v * v)
    # background (depth==1) -> far
    return jnp.where(depth >= 1.0, 1.0, radial / far)


# ---------------------------------------------------------------------------
# PCF shadow tests (dense over the main view)
# ---------------------------------------------------------------------------

def _project_to_light(wpos: jnp.ndarray, light_vp: jnp.ndarray):
    """world pos [..., 3] -> (uv in [0,1]^2 y-down, z_ndc, in_frustum)."""
    ones = jnp.ones_like(wpos[..., :1])
    clip = jnp.einsum("ij,...j->...i", light_vp,
                      jnp.concatenate([wpos, ones], axis=-1))
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    ndc = clip[..., :3] / safe_w[..., None]
    in_frustum = ((ndc[..., 0] >= -1) & (ndc[..., 0] <= 1)
                  & (ndc[..., 1] >= -1) & (ndc[..., 1] <= 1)
                  & (ndc[..., 2] >= 0) & (ndc[..., 2] <= 1) & (w > 0))
    uv = jnp.stack([0.5 + 0.5 * ndc[..., 0], 0.5 - 0.5 * ndc[..., 1]], axis=-1)
    return uv, ndc[..., 2], in_frustum


def _fetch_nearest(shadow_map: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel fetch (the reference uses PointSampler for PCF taps)."""
    s = shadow_map.shape[-1]
    tx = jnp.clip((uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
    ty = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
    # flat single-index row-of-4 gather (multi-index forms and scalar
    # gathers both lower slower on TPU)
    from .ssao import gather_scalar_rows4
    return gather_scalar_rows4(shadow_map.reshape(-1),
                               ty * s + tx).astype(jnp.float32)


def shadow_test_pcf(wpos: jnp.ndarray, ndotl: jnp.ndarray,
                    light_vp: jnp.ndarray, shadow_map: jnp.ndarray,
                    depth_bias: float, slope_scaled: bool = True) -> jnp.ndarray:
    """5x5 PCF (ShadowTestPCF, Lighting.hlsl:177-218) -> visibility [0, 1].
    Out-of-frustum returns 0 (unlit), matching the reference.
    slope_scaled: spot lights use BIAS = bias * tan(acos(NdotL)); the
    directional variant (:222-272) uses the raw bias."""
    uv, z, inside = _project_to_light(wpos, light_vp)
    if slope_scaled:
        nl = jnp.clip(ndotl, 1e-4, 1.0)
        bias = depth_bias * jnp.sqrt(jnp.maximum(1.0 - nl * nl, 0.0)) / nl
    else:
        bias = jnp.broadcast_to(jnp.asarray(depth_bias, jnp.float32), ndotl.shape)
    s = shadow_map.shape[-1]
    texel = 1.0 / s
    shadow = jnp.zeros_like(z)
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            tap = uv + jnp.asarray([dx * texel, dy * texel], jnp.float32)
            closest = _fetch_nearest(shadow_map, tap)
            shadow = shadow + (z - bias > closest).astype(jnp.float32)
    shadow = shadow / 25.0
    return jnp.where(inside, 1.0 - shadow, 0.0)


# D3D cube face mapping consistent with scene/light.py cubemap_view_matrix
# (faces +X -X +Y -Y +Z -Z with the standard up vectors)
def _cube_face_uv(d: jnp.ndarray):
    """direction [..., 3] -> (face [...], uv [..., 2] y-down in [0,1])."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # face selection by dominant axis
    face_x = jnp.where(x >= 0, 0, 1)
    face_y = jnp.where(y >= 0, 2, 3)
    face_z = jnp.where(z >= 0, 4, 5)
    face = jnp.where((ax >= ay) & (ax >= az), face_x,
                     jnp.where(ay >= az, face_y, face_z))
    # view-space coords per face (right, up, forward) per cubemap_view_matrix
    # +X: r=-z u=+y f=+x | -X: r=+z u=+y f=-x | +Y: r=+x u=-z f=+y
    # -Y: r=+x u=+z f=-y | +Z: r=+x u=+y f=+z | -Z: r=-x u=+y f=-z
    # selected with arithmetic where-chains: take_along_axis on the minor
    # axis is a lane-dimension gather, catastrophically slow on TPU
    # (~100 ms per call at 1080p vs ~0 for VPU selects)
    is_x = (ax >= ay) & (ax >= az)
    is_y = ~is_x & (ay >= az)
    sx = jnp.sign(x)
    sy = jnp.sign(y)
    sz = jnp.sign(z)
    rr = jnp.where(is_x, -sx * z, jnp.where(is_y, x, sz * x))
    uu = jnp.where(is_y, -sy * z, y)
    ff = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ff = jnp.maximum(ff, 1e-9)
    uv = jnp.stack([0.5 + 0.5 * rr / ff, 0.5 - 0.5 * uu / ff], axis=-1)
    return face, uv


def _box_blur_clamped(e: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable box blur with clamped edges over the LAST TWO axes
    (leading axes broadcast — lets one call blur a whole stack of maps).
    jnp.roll would wrap border texels to the opposite shadow-map edge and
    leak light/shadow across the frustum border."""
    def blur_axis(a, axis):
        n = a.shape[axis]
        acc = jnp.zeros_like(a)
        for o in range(-radius, radius + 1):
            if o < 0:       # shift down: replicate leading edge
                first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
                body = jax.lax.slice_in_dim(a, 0, n + o, axis=axis)
                shifted = jnp.concatenate([first] * (-o) + [body], axis=axis)
            elif o > 0:     # shift up: replicate trailing edge
                last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
                body = jax.lax.slice_in_dim(a, o, n, axis=axis)
                shifted = jnp.concatenate([body] + [last] * o, axis=axis)
            else:
                shifted = a
            acc = acc + shifted
        return acc / (2 * radius + 1)
    return blur_axis(blur_axis(e, e.ndim - 2), e.ndim - 1)


def pool2_map(m: jnp.ndarray, times: int = 1) -> jnp.ndarray:
    """Mean-pool the last two axes 2x `times` times (reshape + reduce; no
    lane-relayouting strided slices). Shrinks ESM sample tables under the
    ~1-2 MB fast TPU gather threshold — a prefiltered ESM is smooth, so
    sampling a pooled map is visually lossless."""
    for _ in range(times):
        h, w = m.shape[-2] // 2 * 2, m.shape[-1] // 2 * 2
        m = m[..., :h, :w].reshape(*m.shape[:-2], h // 2, 2, w // 2, 2)
        m = m.mean(axis=(-3, -1))
    return m


def prefilter_esm(shadow_map: jnp.ndarray, c: float = 80.0,
                  radius: int = 2, pool: int = 0) -> jnp.ndarray:
    """Exponential shadow map prefilter: blur exp(c*d_occluder) so the
    shading-time test needs ONE tap instead of 25 PCF taps (per-pixel
    gathers cost ~3 ms per tap at 1080p on TPU). Returns log-space map
    back (log of blurred exponential) for bounded storage. Works on any
    [..., S, S] stack; `pool` halves the stored resolution that many
    times (blur first, then pool — the sampled signal is band-limited)."""
    # flatten leading batch dims: blur/pool on a [B, S, S] view — a
    # [5, 6, S, S] operand tempts XLA into laying the 6-face dim on the
    # 128-lane axis (measured 21-34x padding = 19 GB of HBM temps)
    lead = shadow_map.shape[:-2]
    s2 = shadow_map.shape[-2:]
    e = shadow_map.reshape((-1,) + s2) if lead else shadow_map
    e = jnp.exp(jnp.clip(e, 0.0, 1.0) * c - c)           # normalized exp
    e = _box_blur_clamped(e, radius)
    if pool:
        e = pool2_map(e, pool)
    out = jnp.log(jnp.maximum(e, 1e-30)) / c + 1.0       # back to depth units
    return out.reshape(lead + out.shape[-2:]) if lead else out


# Test-time exponent sharpening: visibility = exp(c*(d_map - d))^K =
# exp(K*c*(d_map - d)). The stored map keeps c = 80 (exp(80*d - 80) spans
# f32 safely; c = 160 storage would underflow at d < 0.46), but squaring
# the response at test time delivers c_eff = 160's light-leak suppression
# (measured: mean |ESM - PCF| in fully shadowed regions 0.106 -> ~0.01 on
# the occluder-over-ground scene, tests/test_shadow.py TestEsmVsPcfError)
# while the prefilter blur's penumbra softness survives.
ESM_TEST_SHARPNESS = 2.0


def shadow_test_esm(wpos: jnp.ndarray, light_vp: jnp.ndarray,
                    esm_map: jnp.ndarray, depth_bias: float,
                    c: float = 80.0) -> jnp.ndarray:
    """Single-tap exponential shadow test against a prefilter_esm map:
    visibility = clamp(exp(c * (d_map - d_receiver + bias))). Softness
    comes from the prefilter blur; out-of-frustum = 0 like the reference.
    """
    uv, z, inside = _project_to_light(wpos, light_vp)
    closest = _fetch_nearest(esm_map, uv)
    vis = jnp.exp(jnp.clip((closest - z + depth_bias) * c * ESM_TEST_SHARPNESS, -60.0, 0.0))
    return jnp.where(inside, vis, 0.0)


def shadow_test_esm_batch(wpos: jnp.ndarray, light_vps: jnp.ndarray,
                          esm_maps: jnp.ndarray, depth_biases: jnp.ndarray,
                          c: float = 80.0) -> jnp.ndarray:
    """All C spot/dir casters in ONE projection einsum + ONE stacked-table
    gather (the per-caster loop paid C gather fixed costs; fetch-bound,
    VERDICT r2 #4). wpos [h,w,3], light_vps [C,4,4], esm_maps [C,S,S],
    depth_biases [C] -> visibility [C,h,w]. Counterpart of C calls to
    shadow_test_esm (ForwardLighting.hlsl's per-light ShadowTest loop)."""
    ones = jnp.ones_like(wpos[..., :1])
    wp1 = jnp.concatenate([wpos, ones], axis=-1)            # [h,w,4]
    clip = jnp.einsum("cij,hwj->chwi", light_vps, wp1)      # [C,h,w,4]
    w = clip[..., 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    ndc = clip[..., :3] / safe_w[..., None]
    inside = ((ndc[..., 0] >= -1) & (ndc[..., 0] <= 1)
              & (ndc[..., 1] >= -1) & (ndc[..., 1] <= 1)
              & (ndc[..., 2] >= 0) & (ndc[..., 2] <= 1) & (w > 0))
    s = esm_maps.shape[-1]
    tx = jnp.clip(((0.5 + 0.5 * ndc[..., 0]) * s).astype(jnp.int32), 0, s - 1)
    ty = jnp.clip(((0.5 - 0.5 * ndc[..., 1]) * s).astype(jnp.int32), 0, s - 1)
    cbase = (jnp.arange(esm_maps.shape[0], dtype=jnp.int32)
             * (s * s))[:, None, None]
    from .ssao import gather_scalar_rows4
    closest = gather_scalar_rows4(esm_maps.reshape(-1),
                                  cbase + ty * s + tx).astype(jnp.float32)
    z = ndc[..., 2]
    bias = depth_biases[:, None, None]
    vis = jnp.exp(jnp.clip((closest - z + bias) * c * ESM_TEST_SHARPNESS, -60.0, 0.0))
    return jnp.where(inside, vis, 0.0)


def omni_shadow_test_esm_batch(wpos: jnp.ndarray, light_pos: jnp.ndarray,
                               esm_cubes: jnp.ndarray, fars: jnp.ndarray,
                               depth_biases: jnp.ndarray,
                               c: float = 80.0) -> jnp.ndarray:
    """All C point casters in ONE stacked cube gather. wpos [h,w,3],
    light_pos [C,3], esm_cubes [C,6,S,S], fars/depth_biases [C] ->
    visibility [C,h,w]. See omni_shadow_test_esm."""
    lw = light_pos[:, None, None, :] - wpos[None]           # [C,h,w,3]
    far = jnp.maximum(fars, 1e-6)[:, None, None]
    dist = jnp.linalg.norm(lw, axis=-1) / far
    face, uv = _cube_face_uv(-lw)
    s = esm_cubes.shape[-1]
    tx = jnp.clip((uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
    ty = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
    cbase = (jnp.arange(esm_cubes.shape[0], dtype=jnp.int32)
             * (6 * s * s))[:, None, None]
    from .ssao import gather_scalar_rows4
    closest = gather_scalar_rows4(
        esm_cubes.reshape(-1),
        cbase + (face * s + ty) * s + tx).astype(jnp.float32)
    bias_n = (depth_biases[:, None, None] + 0.001) / far
    return jnp.exp(jnp.clip((closest - dist + bias_n) * c * ESM_TEST_SHARPNESS, -60.0, 0.0))


def omni_shadow_test_esm(wpos: jnp.ndarray, light_pos: jnp.ndarray,
                         esm_cube: jnp.ndarray, far: float,
                         depth_bias: float, c: float = 80.0) -> jnp.ndarray:
    """Single-tap exponential omnidirectional shadow test against a
    radial-distance ESM cube [6, S, S] (values = blurred radial/far in log
    space from prefilter_esm). The one-gather counterpart of the 20-tap
    OmnidirectionalShadowTestPCF (Lighting.hlsl:110-174) — softness comes
    from the prefilter blur."""
    lw = light_pos - wpos
    dist = jnp.linalg.norm(lw, axis=-1) / jnp.maximum(far, 1e-6)
    face, uv = _cube_face_uv(-lw)
    s = esm_cube.shape[-1]
    tx = jnp.clip((uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
    ty = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
    from .ssao import gather_scalar_rows4
    closest = gather_scalar_rows4(
        esm_cube.reshape(-1), (face * s + ty) * s + tx).astype(jnp.float32)
    bias_n = (depth_bias + 0.001) / jnp.maximum(far, 1e-6)
    return jnp.exp(jnp.clip((closest - dist + bias_n) * c * ESM_TEST_SHARPNESS, -60.0, 0.0))


def omni_shadow_test_pcf(wpos: jnp.ndarray, light_pos: jnp.ndarray,
                         cube_maps: jnp.ndarray, far: float,
                         depth_bias: float, cam_pos: jnp.ndarray) -> jnp.ndarray:
    """20-tap omnidirectional PCF (OmnidirectionalShadowTestPCF,
    Lighting.hlsl:110-174). cube_maps [6, S, S] store radial distance / far.
    Returns visibility in [0, 1]."""
    lw = light_pos - wpos                     # pixel -> light
    dist = jnp.linalg.norm(lw, axis=-1)
    view_dist = jnp.linalg.norm(wpos - cam_pos, axis=-1)
    disk_radius = (1.0 + view_dist / far) / 8.0

    s = cube_maps.shape[-1]
    shadow = jnp.zeros_like(dist)
    for i in range(OMNI_TAPS.shape[0]):
        sample_vec = -(lw + OMNI_TAPS[i] * disk_radius[..., None])
        face, uv = _cube_face_uv(sample_vec)
        tx = jnp.clip((uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
        ty = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
        # flat single-index row-of-4 gather (3-index form is ~5x slower)
        from .ssao import gather_scalar_rows4
        closest = gather_scalar_rows4(
            cube_maps.reshape(-1), (face * s + ty) * s + tx) * far
        shadow = shadow + (dist > closest + depth_bias + 0.001).astype(jnp.float32)
    return 1.0 - shadow / OMNI_TAPS.shape[0]
