"""Image-based lighting — counterpart of the reference's environment-map
pipeline: equirect HDR -> cubemap, diffuse irradiance convolution, GGX
specular prefilter per mip, BRDF-integration LUT, and the shading-time
environment illumination (CubemapConvolution.hlsl,
EnvironmentMapRendering.cpp:139-486, Lighting.hlsl:360-395).

TPU-first design: the reference's per-texel sampling loops (a ~100k-sample
hemisphere walk per texel for irradiance, 512 GGX samples per texel per mip
for specular) become *dense cosine/kernel matmuls on the MXU*:

    irradiance(N)  = sum_p env_p * max(0, N . w_p) * dw_p / pi
    prefilter_r(N) = sum_p env_p * k_r(N . w_p) * dw_p / sum_p k_r * dw_p

where p runs over equirect texels with solid angle dw_p = (2pi/W)(pi/H)
sin(theta_p), and k_r is the GGX NDF kernel under the reference's V=N
approximation (L makes angle gamma with N where gamma = 2*theta_H, so
k_r(cos gamma) = D_ggx(cos(gamma/2), r) * cos(gamma/2) * max(cos gamma, 0)).
These are the converged limits of the reference's Monte-Carlo loops.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import brdf as B
from .shadow import _cube_face_uv

PI = float(np.pi)


# ---------------------------------------------------------------------------
# direction <-> equirect mapping (ShadingMath.hlsl:70-80)
# ---------------------------------------------------------------------------

def direction_to_equirect_uv(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> uv [..., 2] (exact DirectionToEquirectUV)."""
    u = jnp.arctan2(v[..., 2], v[..., 0]) / (-2.0 * PI) + 0.5
    w = jnp.arcsin(-v[..., 1] / jnp.maximum(
        jnp.linalg.norm(v, axis=-1), 1e-9)) / PI + 0.5
    return jnp.stack([u, w], axis=-1)


def equirect_texel_directions(width: int, height: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (dirs [H*W, 3], solid_angles [H*W]) for equirect texel centers.
    Inverts DirectionToEquirectUV: u = atan2(z,x)/(-2pi)+0.5, v = asin(-y)/pi+0.5."""
    us = (np.arange(width) + 0.5) / width
    vs = (np.arange(height) + 0.5) / height
    U, V = np.meshgrid(us, vs)                       # [H, W]
    phi = (0.5 - U) * 2.0 * np.pi                    # atan2(z, x)
    elev = (V - 0.5) * np.pi                         # asin(-y)
    y = -np.sin(elev)
    c = np.cos(elev)
    x = c * np.cos(phi)
    z = c * np.sin(phi)
    dirs = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
    # solid angle: dphi * dtheta * sin(polar theta); polar = pi/2 + elev
    sin_polar = np.clip(np.cos(elev), 1e-6, 1.0)     # cos(elev) == sin(polar)
    omega = (2.0 * np.pi / width) * (np.pi / height) * sin_polar
    return dirs, omega.reshape(-1).astype(np.float32)


def cube_texel_directions(size: int) -> np.ndarray:
    """World-space directions of cube texel centers [6, S, S, 3], matching
    the D3D face conventions in scene/light.py cubemap_view_matrix."""
    t = (np.arange(size, dtype=np.float32) + 0.5) / size
    a = t * 2.0 - 1.0                                # face-local in [-1, 1]
    u, v = np.meshgrid(a, -a)                        # u right, v up (y-down rows)
    one = np.ones_like(u)
    # (right, up, forward) per face as in shadow._cube_face_uv
    faces = [
        (+one, None),  # placeholder
    ]
    d = np.zeros((6, size, size, 3), dtype=np.float32)
    # face 0 +X: dir = f*x_hat + u*(-z_hat) + v*(y_hat)
    d[0] = np.stack([one, v, -u], axis=-1)
    d[1] = np.stack([-one, v, u], axis=-1)
    d[2] = np.stack([u, one, -v], axis=-1)   # +Y: r=+x, u=-z, f=+y
    d[3] = np.stack([u, -one, v], axis=-1)   # -Y: r=+x, u=+z, f=-y
    d[4] = np.stack([u, v, one], axis=-1)    # +Z
    d[5] = np.stack([-u, v, -one], axis=-1)  # -Z
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def sample_equirect_bilinear(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C], uv [..., 2] -> [..., C]; wraps in u, clamps in v."""
    h, w = img.shape[0], img.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def flatten_mip_pyramid(mips: list[jnp.ndarray]):
    """Flatten a list of [..., S_m, S_m, C] mips into one [Ntexels, C]
    array + static per-level offsets, so a per-pixel mip-varying fetch is
    ONE gather (index arithmetic selects the level; TPU gathers cost ~1
    element/cycle, so fetching every level and selecting costs L x more).
    Returns (flat [N, C], offsets list, sizes list)."""
    flats = []
    offsets = []
    off = 0
    for m in mips:
        c = m.shape[-1]
        flats.append(m.reshape(-1, c))
        offsets.append(off)
        off += flats[-1].shape[0]
    return jnp.concatenate(flats, axis=0), offsets, [m.shape for m in mips]


def sample_cube_pyramid_nearest(flat: jnp.ndarray, offsets, shapes,
                                dirs: jnp.ndarray, level: jnp.ndarray
                                ) -> jnp.ndarray:
    """Nearest sample from a flattened cubemap mip pyramid:
    flat from flatten_mip_pyramid over [6,S,S,C] mips; dirs [...,3];
    level [...] int32. ONE gather total."""
    face, uv = _cube_face_uv(dirs)
    idx = jnp.zeros(level.shape, jnp.int32)
    for m, (off, shp) in enumerate(zip(offsets, shapes)):
        s = shp[1]
        tx = jnp.clip((uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
        ty = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
        cand = off + (face * s + ty) * s + tx
        idx = jnp.where(level == m, cand, idx)
    return flat[idx].astype(jnp.float32)


def sample_cube(cube: jnp.ndarray, dirs: jnp.ndarray,
                bilinear: bool = True) -> jnp.ndarray:
    """cube [6, S, S, C], dirs [..., 3] -> [..., C] (clamped within face)."""
    face, uv = _cube_face_uv(dirs)
    s = cube.shape[1]
    flat = cube.reshape(-1, cube.shape[-1])
    # flattened single-index gathers: 3-index cube[face,ty,tx] lowers to a
    # generalized gather ~5x slower on TPU (measured 25.4 vs 4.8 ms for
    # 2M rgb fetches)
    if not bilinear:
        tx = jnp.clip((uv[..., 0] * s).astype(jnp.int32), 0, s - 1)
        ty = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
        return flat[(face * s + ty) * s + tx].astype(jnp.float32)
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s - 1)
    x1i = jnp.clip(x0i + 1, 0, s - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    y1i = jnp.clip(y0i + 1, 0, s - 1)
    base = face * (s * s)
    c00 = flat[base + y0i * s + x0i]
    c10 = flat[base + y0i * s + x1i]
    c01 = flat[base + y1i * s + x0i]
    c11 = flat[base + y1i * s + x1i]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


# ---------------------------------------------------------------------------
# load-time convolutions (all MXU matmuls)
# ---------------------------------------------------------------------------

def downsample_equirect(img: jnp.ndarray, target_w: int) -> jnp.ndarray:
    """Box-average an equirect map down to target_w x target_w/2."""
    h, w = img.shape[0], img.shape[1]
    th = target_w // 2
    fy, fx = h // th, w // target_w
    if fy < 1 or fx < 1:
        return img
    img = img[: th * fy, : target_w * fx]
    return img.reshape(th, fy, target_w, fx, -1).mean(axis=(1, 3))


def equirect_to_cubemap(equirect: jnp.ndarray, size: int) -> jnp.ndarray:
    """-> [6, S, S, 3] (the reference's equirect->cube draw,
    EnvironmentMapRendering.cpp:197-260)."""
    dirs = jnp.asarray(cube_texel_directions(size))
    uv = direction_to_equirect_uv(dirs)
    return sample_equirect_bilinear(equirect, uv)


def diffuse_irradiance_cube(equirect: jnp.ndarray, size: int = 64,
                            source_width: int = 64) -> jnp.ndarray:
    """Exact cosine convolution as one matmul (the converged limit of
    PSMain_DiffuseIrradiance, CubemapConvolution.hlsl:112-163):
    irradiance(N) = sum_p env_p max(0, N.w_p) dw_p / pi."""
    src = downsample_equirect(equirect, source_width)
    sh, sw = src.shape[0], src.shape[1]
    dirs_p, omega_p = equirect_texel_directions(sw, sh)
    dirs_n = cube_texel_directions(size).reshape(-1, 3)          # [NC, 3]
    cosm = jnp.maximum(jnp.asarray(dirs_n) @ jnp.asarray(dirs_p).T, 0.0)
    weights = cosm * jnp.asarray(omega_p)[None, :]               # [NC, P]
    out = (weights @ src.reshape(-1, 3)) / PI
    return out.reshape(6, size, size, 3)


def _ggx_prefilter_kernel(cos_gamma: jnp.ndarray, roughness: float) -> jnp.ndarray:
    """Radial GGX prefilter kernel under the reference's V=N approximation:
    L is at angle gamma from N with gamma = 2*theta_H, weighted by NdotL."""
    cg = jnp.clip(cos_gamma, -1.0, 1.0)
    cos_half = jnp.sqrt(jnp.maximum(0.5 * (1.0 + cg), 0.0))      # cos(gamma/2)
    d = B.ndf_ggx(cos_half, jnp.asarray(roughness))
    return d * cos_half * jnp.maximum(cg, 0.0)


def specular_prefilter_mips(equirect: jnp.ndarray, base_size: int = 128,
                            num_mips: int = 6,
                            source_width: int = 128) -> list[jnp.ndarray]:
    """GGX specular prefilter chain: mip m has roughness m/(num_mips-1)
    (EnvironmentMapRendering.cpp:432). Mip 0 (mirror) is a direct resample;
    rougher mips are kernel matmuls."""
    mips = [equirect_to_cubemap(equirect, base_size)]
    src = downsample_equirect(equirect, source_width)
    sh, sw = src.shape[0], src.shape[1]
    dirs_p, omega_p = equirect_texel_directions(sw, sh)
    dp = jnp.asarray(dirs_p)
    op = jnp.asarray(omega_p)
    src_flat = src.reshape(-1, 3)
    for m in range(1, num_mips):
        size = max(base_size >> m, 4)
        roughness = m / (num_mips - 1)
        dirs_n = jnp.asarray(cube_texel_directions(size).reshape(-1, 3))
        cosg = dirs_n @ dp.T                                      # [NC, P]
        k = _ggx_prefilter_kernel(cosg, roughness) * op[None, :]
        norm = jnp.maximum(k.sum(axis=1, keepdims=True), 1e-9)
        mips.append(((k @ src_flat) / norm).reshape(6, size, size, 3))
    return mips


def sh9_basis(d):
    """Real spherical-harmonics basis l<=2 at unit directions [..., 3] ->
    [..., 9] (ordering: 00, 1-1, 10, 11, 2-2, 2-1, 20, 21, 22)."""
    xp = jnp if isinstance(d, jnp.ndarray) else np
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return xp.stack([
        0.282095 * xp.ones_like(x),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z, 0.546274 * (x * x - y * y),
    ], axis=-1)


def sh9_irradiance_coeffs(equirect: jnp.ndarray,
                          source_width: int = 64) -> jnp.ndarray:
    """Project the environment onto l<=2 SH and fold in the cosine-lobe
    convolution (Ramamoorthi-Hanrahan): returns [9, 3] coefficients C with
        E(N)/pi = sh9_basis(N) @ C
    — the exact l<=2 band-limit of diffuse_irradiance_cube's dense cosine
    matmul (which is itself the converged limit of the reference's
    per-texel hemisphere walk, CubemapConvolution.hlsl:112-163). Diffuse
    irradiance is smooth enough that the l<=2 truncation is visually
    exact, and evaluation is pure arithmetic — zero per-pixel gathers."""
    src = downsample_equirect(equirect, source_width)
    sh, sw = src.shape[0], src.shape[1]
    dirs_p, omega_p = equirect_texel_directions(sw, sh)
    basis = sh9_basis(dirs_p)                                    # [P, 9]
    L = (basis * omega_p[:, None]).T @ np.asarray(
        src.reshape(-1, 3), np.float32)                          # [9, 3]
    a = np.array([np.pi, 2 * np.pi / 3, 2 * np.pi / 3, 2 * np.pi / 3,
                  np.pi / 4, np.pi / 4, np.pi / 4, np.pi / 4, np.pi / 4],
                 np.float32)
    return jnp.asarray(L * a[:, None] / np.pi)


def sh9_eval(normal: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """normal [..., 3], coeffs [9, C] -> [..., C] (one small MXU matmul)."""
    return jnp.maximum(sh9_basis(normal) @ coeffs, 0.0)


_BRDF_LUT_CACHE: dict[int, np.ndarray] = {}


def brdf_lut_cached(size: int = 256, num_samples: int = 512) -> np.ndarray:
    """Process-cached BRDF integration LUT (computed once, like the
    reference's procedural BRDF_INTEGRATION_LUT texture, Renderer.h:77-84)."""
    lut = _BRDF_LUT_CACHE.get(size)
    if lut is None:
        lut = np.asarray(B.brdf_integration_lut(size, num_samples))
        _BRDF_LUT_CACHE[size] = lut
    return lut


def _cheb_basis(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Chebyshev T_0..T_{d-1} of x in [0,1] -> [..., d]."""
    xm = 2.0 * x - 1.0
    ts = [jnp.ones_like(xm), xm]
    for _ in range(d - 2):
        ts.append(2.0 * xm * ts[-1] - ts[-2])
    return jnp.stack(ts[:d], axis=-1)


_BRDF_POLY_CACHE: dict = {}


def brdf_poly_fit(lut: np.ndarray, degree: int = 20) -> np.ndarray:
    """Fit a 2D Chebyshev surface to OUR measured split-sum LUT:
    [L, L, 2] -> coeffs [degree, degree, 2] with
    value(ndotv, rough) = sum_ij C[i,j] T_i(ndotv) T_j(rough).

    Published analytic BRDF fits (Karis/Lazarov) were rejected in round 1
    because they approximate a different geometry term; fitting the exact
    LUT this renderer integrates keeps the curve while replacing the
    per-pixel LUT GATHER (~5 ms/frame at 1080p — fetch-count-bound) with
    VPU/MXU arithmetic. Max fit error is asserted in tests/test_ibl.py."""
    key = (lut.shape[0], degree)
    hit = _BRDF_POLY_CACHE.get(key)
    if hit is not None:
        return hit
    l = lut.shape[0]
    g = (np.arange(l) + 0.5) / l
    b = np.asarray(_cheb_basis(jnp.asarray(g, jnp.float32), degree))
    # lut[iy, ix]: ix -> ndotv, iy -> roughness (brdf_integration_lut)
    a = np.einsum("xi,yj->yxij", b, b).reshape(l * l, degree * degree)
    sol, *_ = np.linalg.lstsq(a, np.asarray(lut).reshape(l * l, 2),
                              rcond=None)
    coeffs = sol.reshape(degree, degree, 2).astype(np.float32)
    _BRDF_POLY_CACHE[key] = coeffs
    return coeffs


def brdf_poly_eval(coeffs: jnp.ndarray, ndotv: jnp.ndarray,
                   roughness: jnp.ndarray) -> jnp.ndarray:
    """-> [..., 2] (f0 scale, bias) from the fitted Chebyshev surface."""
    tx = _cheb_basis(jnp.clip(ndotv, 0.0, 1.0), coeffs.shape[0])
    ty = _cheb_basis(jnp.clip(roughness, 0.0, 1.0), coeffs.shape[1])
    tmp = jnp.einsum("...i,ijc->...jc", tx, coeffs)
    return jnp.einsum("...jc,...j->...c", tmp, ty)


# ---------------------------------------------------------------------------
# shading-time environment illumination (Lighting.hlsl:348-395)
# ---------------------------------------------------------------------------

def hdri_rotation(v: jnp.ndarray, yaw_rad) -> jnp.ndarray:
    """GetHDRIRotationMatrix (Lighting.hlsl:348-358): rotate sample
    direction about +Y by -yaw."""
    c = jnp.cos(-yaw_rad)
    s = jnp.sin(-yaw_rad)
    x = c * v[..., 0] + s * v[..., 2]
    z = -s * v[..., 0] + c * v[..., 2]
    return jnp.stack([x, v[..., 1], z], axis=-1)


def environment_illumination(normal: jnp.ndarray, view: jnp.ndarray,
                             roughness: jnp.ndarray, metalness: jnp.ndarray,
                             albedo: jnp.ndarray,
                             diffuse_cube: jnp.ndarray,
                             specular_mips: list[jnp.ndarray],
                             brdf_lut: jnp.ndarray,
                             hdri_yaw=0.0,
                             sh_irradiance: jnp.ndarray | None = None,
                             brdf_poly: jnp.ndarray | None = None) -> jnp.ndarray:
    """CalculateEnvironmentMapIllumination (Lighting.hlsl:360-380):
    IBL diffuse + prefiltered specular with the split-sum BRDF LUT.

    Gather budget (the TPU cost): with sh_irradiance (SH9 coefficients)
    and brdf_poly (a Chebyshev fit of OUR exact LUT — published analytic
    fits approximate a different geometry term and were rejected), the
    pass costs ONE per-pixel gather (the specular pyramid); diffuse and
    the split-sum scale/bias become MXU/VPU arithmetic."""
    ndotv = jnp.clip((normal * view).sum(-1), 0.0, 1.0)
    r = B.reflect(-view, normal)
    r = hdri_rotation(r, hdri_yaw)
    n_rot = hdri_rotation(normal, hdri_yaw)

    max_lod = len(specular_mips) - 1
    # integer mip select like the reference (int MIP_LEVEL = r * MAX_LOD);
    # one gather through the flattened pyramid instead of sampling every
    # level and selecting (gathers are ~1 element/cycle)
    mip = jnp.clip((roughness * max_lod).astype(jnp.int32), 0, max_lod)
    flat, offs, shapes = flatten_mip_pyramid(list(specular_mips))
    spec = sample_cube_pyramid_nearest(flat, offs, shapes, r, mip)

    if brdf_poly is not None:
        f0_scale_bias = brdf_poly_eval(brdf_poly, ndotv, roughness)
    else:
        lut_n = brdf_lut.shape[0]
        ix = jnp.clip((ndotv * lut_n).astype(jnp.int32), 0, lut_n - 1)
        iy = jnp.clip((roughness * lut_n).astype(jnp.int32), 0, lut_n - 1)
        f0_scale_bias = brdf_lut.reshape(-1, 2)[iy * lut_n + ix].astype(
            jnp.float32)                             # [..., 2]

    if sh_irradiance is not None:
        diffuse_irr = sh9_eval(n_rot, sh_irradiance)
    else:
        diffuse_irr = sample_cube(diffuse_cube, n_rot, bilinear=False)
    return B.environment_brdf(ndotv, roughness, metalness, albedo,
                              diffuse_irr, spec, f0_scale_bias)


def sky_radiance(dirs: jnp.ndarray, equirect: jnp.ndarray, hdri_yaw=0.0,
                 bilinear: bool = False) -> jnp.ndarray:
    """Skydome sampling for background pixels (Skydome.hlsl behavior:
    equirect lookup of the view ray). Nearest by default — per-pixel
    gathers cost ~1 element/cycle, and sky content is low frequency."""
    d = hdri_rotation(dirs, hdri_yaw)
    uv = direction_to_equirect_uv(d)
    if bilinear:
        return sample_equirect_bilinear(equirect, uv)
    h, w = equirect.shape[0], equirect.shape[1]
    tx = jnp.mod((uv[..., 0] * w).astype(jnp.int32), w)
    ty = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    return equirect.reshape(-1, equirect.shape[-1])[ty * w + tx].astype(
        jnp.float32)


# ---------------------------------------------------------------------------
# procedural fallback sky (the reference's HDRI files are not shipped)
# ---------------------------------------------------------------------------

def procedural_sky_equirect(width: int = 512, height: int = 256,
                            sun_dir=(0.3, 0.8, 0.5), sun_intensity: float = 50.0,
                            zenith=(0.25, 0.45, 0.85), horizon=(0.8, 0.85, 0.95),
                            ground=(0.25, 0.22, 0.2)) -> np.ndarray:
    """Simple physically-plausible HDR sky: gradient + sun disc + ground."""
    dirs, _ = equirect_texel_directions(width, height)
    y = dirs[:, 1]
    sun = np.asarray(sun_dir, np.float32)
    sun /= np.linalg.norm(sun)
    cos_sun = dirs @ sun
    sky_t = np.clip(y, 0.0, 1.0) ** 0.6
    col = (np.asarray(horizon, np.float32)[None] * (1 - sky_t[:, None])
           + np.asarray(zenith, np.float32)[None] * sky_t[:, None])
    g_t = np.clip(-y, 0.0, 1.0)[:, None]
    col = col * (1 - g_t) + np.asarray(ground, np.float32)[None] * g_t
    disc = np.exp((cos_sun - 1.0) * 2000.0)[:, None] * sun_intensity
    halo = np.exp((cos_sun - 1.0) * 20.0)[:, None] * 0.5
    col = col + (disc + halo) * np.asarray([1.0, 0.95, 0.85], np.float32)[None]
    return col.reshape(height, width, 3).astype(np.float32)
