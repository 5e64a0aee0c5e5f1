"""PBR BRDF math — counterpart of Shaders/BRDF.hlsl (Trowbridge-Reitz GGX
NDF :64-79, Smith-Schlick geometry :81-129, Schlick Fresnel :131-156,
Cook-Torrance BRDF :163-194, EnvironmentBRDF split-sum :196-207,
GGX importance sampling :217-238, BRDF-integration LUT :239-283) and
ShadingMath.hlsl (Hammersley :119-127).

All functions are vectorized jnp over [..., 3] / [...] tensors — one call
shades every pixel at once (the VPU replaces the pixel-shader lanes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PI = float(np.pi)
EPS = 1e-12


def _pow5(x):
    """x^5 by multiplication: jnp.power with a float exponent lowers to a
    multi-pass exp/log on the TPU VPU; Fresnel runs per light per pixel."""
    x2 = x * x
    return x2 * x2 * x


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def normalize(v, eps: float = 1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def reflect(i, n):
    """HLSL reflect(): i - 2*dot(n,i)*n."""
    return i - 2.0 * _dot(n, i)[..., None] * n


# ---------------------------------------------------------------------------
# microfacet terms (BRDF.hlsl:64-129)
# ---------------------------------------------------------------------------

def ndf_ggx(ndoth, roughness):
    """Trowbridge-Reitz GGX (BRDF.hlsl:65-79)."""
    a = roughness * roughness
    a2 = a * a
    nh2 = ndoth * ndoth
    denom = PI * jnp.square(nh2 * (a2 - 1.0) + 1.0)
    return jnp.where(denom < 1e-12, 1.0, a2 / jnp.maximum(denom, 1e-12))


def geometry_smith_schlick_ggx(n, v, roughness):
    """Direct-lighting variant, k = (r+1)^2/8 (BRDF.hlsl:82-97)."""
    k = jnp.square(roughness + 1.0) / 8.0
    nv = jnp.maximum(0.0, _dot(n, v))
    return nv / (nv * (1.0 - k) + k + 1e-4)


def geometry_smith_schlick_ggx_ibl(n, v, roughness):
    """IBL variant, k = r^2/2 (BRDF.hlsl:100-115)."""
    k = jnp.square(roughness) / 2.0
    nv = jnp.maximum(0.0, _dot(n, v))
    return nv / (nv * (1.0 - k) + k + 1e-4)


def geometry_smith(n, v, l, roughness):
    """BRDF.hlsl:118-121."""
    return (geometry_smith_schlick_ggx(n, v, roughness)
            * geometry_smith_schlick_ggx(n, l, roughness))


def geometry_smith_ibl(n, v, l, roughness):
    """BRDF.hlsl:124-129."""
    return (geometry_smith_schlick_ggx_ibl(n, v, roughness)
            * geometry_smith_schlick_ggx_ibl(n, l, roughness))


def fresnel_schlick(n, v, f0):
    """BRDF.hlsl:132-136: F0 + (1-F0)*(1 - max(0, dot(N,V)))^5."""
    p = _pow5(1.0 - jnp.maximum(0.0, _dot(n, v)))
    return f0 + (1.0 - f0) * p[..., None]


def fresnel_with_roughness(cos_theta, f0, roughness):
    """BRDF.hlsl:152-156 (Lagarde) for IBL."""
    one_minus_r = (1.0 - roughness)[..., None]
    return f0 + (jnp.maximum(one_minus_r, f0) - f0) * _pow5(1.0 - cos_theta)[..., None]


def lambert_diffuse(kd):
    """BRDF.hlsl:158-161."""
    return kd / PI


# ---------------------------------------------------------------------------
# the Cook-Torrance BRDF (BRDF.hlsl:163-194)
# ---------------------------------------------------------------------------

def brdf(normal, albedo, roughness, metalness, wi, v):
    """Evaluate fr(s, Wi, V) exactly as BRDF.hlsl:163-194.

    normal/albedo/wi/v: [..., 3]; roughness/metalness: [...].
    Note the reference evaluates Fresnel with (H, V) — fresnel_schlick's
    internal dot uses its first two args in that order (BRDF.hlsl:181).
    """
    wo = normalize(v)
    n = normalize(normal)
    h = normalize(wo + wi)
    ndoth = saturate(_dot(n, h))
    ndotv = saturate(_dot(n, wo))
    ndotl = saturate(_dot(n, wi))

    # lerp(0.04, albedo, metalness) — BRDF.hlsl:178
    f0 = 0.04 + (albedo - 0.04) * jnp.asarray(metalness)[..., None]

    f = fresnel_schlick(h, v, f0)
    g = geometry_smith(n, wo, wi, roughness)
    d = ndf_ggx(ndoth, roughness)
    denom = jnp.maximum(4.0 * ndotv * ndotl, 1e-4)
    specular = d[..., None] * f * g[..., None] / denom[..., None]

    ks = f
    kd = (1.0 - ks) * (1.0 - metalness[..., None])
    diffuse = lambert_diffuse(kd * albedo)
    return diffuse + specular


def environment_brdf(ndotv, roughness, metallic, diffuse_color,
                     diffuse_irradiance, prefiltered_specular, f0_scale_bias):
    """Split-sum IBL combine (BRDF.hlsl:196-207).
    f0_scale_bias: [..., 2] from the BRDF-integration LUT."""
    f0 = 0.04 + (diffuse_color - 0.04) * metallic[..., None]
    ks = fresnel_with_roughness(ndotv, f0, roughness)
    kd = (1.0 - ks) * (1.0 - metallic[..., None])
    diffuse = diffuse_irradiance * diffuse_color
    specular = prefiltered_specular * (ks * f0_scale_bias[..., 0:1]
                                       + f0_scale_bias[..., 1:2])
    return kd * diffuse + specular


# ---------------------------------------------------------------------------
# quasi-Monte-Carlo sampling (ShadingMath.hlsl:87-127, BRDF.hlsl:217-283)
# ---------------------------------------------------------------------------

def radical_inverse_vdc(bits: jnp.ndarray) -> jnp.ndarray:
    """Van der Corput via bit reversal (ShadingMath.hlsl:87-95)."""
    u = np.uint32
    bits = bits.astype(jnp.uint32)
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & u(0x55555555)) << 1) | ((bits & u(0xAAAAAAAA)) >> 1)
    bits = ((bits & u(0x33333333)) << 2) | ((bits & u(0xCCCCCCCC)) >> 2)
    bits = ((bits & u(0x0F0F0F0F)) << 4) | ((bits & u(0xF0F0F0F0)) >> 4)
    bits = ((bits & u(0x00FF00FF)) << 8) | ((bits & u(0xFF00FF00)) >> 8)
    return bits.astype(jnp.float32) * 2.3283064365386963e-10


def hammersley(i: jnp.ndarray, count: int) -> jnp.ndarray:
    """[N] -> [N, 2] low-discrepancy sequence (ShadingMath.hlsl:119-127)."""
    return jnp.stack([i.astype(jnp.float32) / count,
                      radical_inverse_vdc(i)], axis=-1)


def importance_sample_ggx(xi: jnp.ndarray, n: jnp.ndarray, roughness) -> jnp.ndarray:
    """GGX-biased half-vector sampling (BRDF.hlsl:217-238).
    xi: [..., 2], n: [..., 3] -> h [..., 3] world space."""
    a = roughness * roughness
    phi = 2.0 * PI * xi[..., 0]
    cos_theta = jnp.sqrt((1.0 - xi[..., 1])
                         / (1.0 + (a * a - 1.0) * xi[..., 1]))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    h_t = jnp.stack([jnp.cos(phi) * sin_theta,
                     jnp.sin(phi) * sin_theta,
                     cos_theta], axis=-1)
    # tangent basis around n (BRDF.hlsl:232-236)
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.999,
                   jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n.shape),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape))
    tangent = normalize(jnp.cross(up, n))
    bitangent = jnp.cross(n, tangent)
    return normalize(tangent * h_t[..., 0:1] + bitangent * h_t[..., 1:2]
                     + n * h_t[..., 2:3])


def integrate_brdf(ndotv: jnp.ndarray, roughness: jnp.ndarray,
                   num_samples: int = 512) -> jnp.ndarray:
    """Split-sum BRDF integration -> (F0 scale, F0 bias) (BRDF.hlsl:239-283).
    ndotv/roughness broadcastable [...] -> [..., 2]."""
    ndotv = jnp.maximum(ndotv, 1e-4)
    v = jnp.stack([jnp.sqrt(1.0 - ndotv * ndotv),
                   jnp.zeros_like(ndotv), ndotv], axis=-1)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), v.shape)

    i = jnp.arange(num_samples, dtype=jnp.uint32)
    xi = hammersley(i, num_samples)                       # [S, 2]

    def sample(acc, xi_s):
        h = importance_sample_ggx(xi_s, n, roughness)     # [..., 3]
        l = normalize(reflect(-v, h))
        ndotl = jnp.maximum(l[..., 2], 0.0)
        ndoth = jnp.maximum(h[..., 2], 0.0)
        vdoth = jnp.maximum(_dot(v, h), 0.0)
        g = geometry_smith_ibl(n, v, l, roughness)
        g_vis = jnp.maximum(g * vdoth / jnp.maximum(ndoth * ndotv, 1e-6), 1e-4)
        fc = _pow5(1.0 - vdoth)
        scale = jnp.where(ndotl > 0, (1.0 - fc) * g_vis, 0.0)
        bias = jnp.where(ndotl > 0, fc * g_vis, 0.0)
        return (acc[0] + scale, acc[1] + bias), None

    init = (jnp.zeros_like(ndotv), jnp.zeros_like(ndotv))
    (scale, bias), _ = jax.lax.scan(sample, init, xi)
    return jnp.stack([scale, bias], axis=-1) / num_samples


def brdf_integration_lut(size: int = 256, num_samples: int = 512) -> jnp.ndarray:
    """The BRDF_INTEGRATION_CS LUT (BRDF.hlsl:239-283; created once at load,
    Renderer.h:77-84): [size, size, 2] indexed by (NdotV, roughness)."""
    ndotv = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    rough = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    nv, r = jnp.meshgrid(ndotv, rough, indexing="xy")  # x: NdotV, y: roughness
    return integrate_brdf(nv, r, num_samples)
