"""Forward PBR shading — counterpart of Shaders/ForwardLighting.hlsl PSMain
(:222-391) and the illumination functions in Shaders/Lighting.hlsl
(:308-345 point/spot/directional, :57-73 spotlight cone, :29-32 inverse-
square attenuation).

The pixel-shader light loops become lax.scan over padded SoA light tensors;
the whole screen shades in one vectorized pass. Shadowing is factored out:
per-caster visibility maps (from ops/shadow.py) multiply the corresponding
caster's contribution, mirroring ForwardLighting.hlsl:320-377.

Light tensor layouts (scene/light.py pack_* functions):
  point [P, 12]: position(3) range color(3) brightness depth_bias shadow_far pad(2)
  spot  [S, 12]: position(3) outer_cos_angle color(3) brightness dir(3) depth_bias
  spot_extra [S, 4]: inner_angle range pad(2)
  directional [12]: dir(3) brightness color(3) depth_bias shadowing enabled
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import brdf as B


def _point_light_radiance(lrow, p, n, v, albedo, roughness, metalness):
    """CalculatePointLightIllumination (Lighting.hlsl:308-322)."""
    lpos = lrow[0:3]
    lrange = lrow[3]
    color = lrow[4:7]
    brightness = lrow[7]
    to_l = lpos - p
    d = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(d, 1e-9)[..., None]
    ndotl = B.saturate(B._dot(n, wi))
    radiance = (1.0 / jnp.maximum(d * d, 1e-9))[..., None] * color * brightness
    fr = B.brdf(n, albedo, roughness, metalness, wi, v)
    contrib = fr * radiance * ndotl[..., None]
    return jnp.where((d < lrange)[..., None], contrib, 0.0)


def _spot_intensity(spot_dir, outer, inner, lpos, p):
    """SpotlightIntensity (Lighting.hlsl:57-73): angular falloff between
    inner and outer cone angles (radians)."""
    pix_dir = B.normalize(p - lpos)
    cos_t = B._dot(pix_dir, B.normalize(jnp.broadcast_to(spot_dir, p.shape)))
    theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    t = 1.0 - (theta - inner) / jnp.maximum(outer - inner, 1e-6)
    return jnp.where(theta > outer, 0.0, jnp.where(theta <= inner, 1.0, t))


def _spot_light_radiance(lrow, extra, p, n, v, albedo, roughness, metalness):
    """CalculateSpotLightIllumination (Lighting.hlsl:323-333)."""
    lpos = lrow[0:3]
    outer = lrow[3]
    color = lrow[4:7]
    brightness = lrow[7]
    sdir = lrow[8:11]
    inner = extra[0]
    to_l = lpos - p
    d = jnp.linalg.norm(to_l, axis=-1)
    wi = to_l / jnp.maximum(d, 1e-9)[..., None]
    ndotl = B.saturate(B._dot(n, wi))
    intensity = _spot_intensity(sdir, outer, inner, lpos, p)
    radiance = (intensity / jnp.maximum(d * d, 1e-9))[..., None] * color * brightness
    fr = B.brdf(n, albedo, roughness, metalness, wi, v)
    return fr * radiance * ndotl[..., None]


def directional_light_radiance(drow, n, v, albedo, roughness, metalness):
    """CalculateDirectionalLightIllumination (Lighting.hlsl:334-345)."""
    wi = B.normalize(-drow[0:3])
    radiance = drow[4:7] * drow[3]
    wi_b = jnp.broadcast_to(wi, n.shape)
    ndotl = B.saturate(B._dot(n, wi_b))
    fr = B.brdf(n, albedo, roughness, metalness, wi_b, v)
    return fr * radiance * ndotl[..., None] * drow[9]  # * enabled


def shade_forward(
    world_pos: jnp.ndarray,        # [..., 3]
    normal: jnp.ndarray,           # [..., 3] (normalized)
    albedo: jnp.ndarray,           # [..., 3] linear
    roughness: jnp.ndarray,        # [...]
    metalness: jnp.ndarray,        # [...]
    emissive: jnp.ndarray,         # [..., 3] (color * intensity, linear)
    ao: jnp.ndarray,               # [...] combined ambient occlusion * factor
    camera_pos: jnp.ndarray,       # [3]
    point_lights: jnp.ndarray,     # [P, 12] unshadowed
    spot_lights: jnp.ndarray,      # [S, 12] unshadowed
    spot_extra: jnp.ndarray,       # [S, 4]
    directional: jnp.ndarray,      # [12]
    point_casters: jnp.ndarray | None = None,   # [PC, 12]
    point_shadow: jnp.ndarray | None = None,    # [PC, ...] visibility 0..1
    spot_casters: jnp.ndarray | None = None,    # [SC, 12]
    spot_caster_extra: jnp.ndarray | None = None,
    spot_shadow: jnp.ndarray | None = None,     # [SC, ...]
    dir_shadow: jnp.ndarray | None = None,      # [...]
    env_illumination: jnp.ndarray | None = None,  # [..., 3] from ops/ibl.py
) -> jnp.ndarray:
    """The full PSMain illumination sum (ForwardLighting.hlsl:288-377):
    ambient + emissive + environment + unshadowed loops + shadowed loops
    (each multiplied by its visibility map) + directional."""
    v = B.normalize(camera_pos - world_pos)

    # ambient + emissive (ForwardLighting.hlsl:290-293)
    total = albedo * ao[..., None] + emissive

    if env_illumination is not None:
        total = total + env_illumination

    def scan_point(total, lrow):
        return total + _point_light_radiance(
            lrow, world_pos, normal, v, albedo, roughness, metalness), None

    def scan_spot(total, packed):
        lrow, extra = packed
        return total + _spot_light_radiance(
            lrow, extra, world_pos, normal, v, albedo, roughness, metalness), None

    # small light counts unroll (same accumulation order as the scan, so
    # results are bit-identical) — scan bodies don't fuse across
    # iterations and spill the carry to HBM each step; the reference's
    # 100-light budget stays a scan
    UNROLL = 16
    if point_lights.shape[0]:
        if point_lights.shape[0] <= UNROLL:
            for i in range(point_lights.shape[0]):
                total, _ = scan_point(total, point_lights[i])
        else:
            total, _ = jax.lax.scan(scan_point, total, point_lights)
    if spot_lights.shape[0]:
        if spot_lights.shape[0] <= UNROLL:
            for i in range(spot_lights.shape[0]):
                total, _ = scan_spot(total, (spot_lights[i], spot_extra[i]))
        else:
            total, _ = jax.lax.scan(scan_spot, total, (spot_lights, spot_extra))

    # shadow casters: contribution * per-caster visibility map
    if point_casters is not None and point_casters.shape[0]:
        def scan_point_sh(total, packed):
            lrow, vis = packed
            c = _point_light_radiance(lrow, world_pos, normal, v,
                                      albedo, roughness, metalness)
            return total + c * vis[..., None], None
        total, _ = jax.lax.scan(scan_point_sh, total, (point_casters, point_shadow))

    if spot_casters is not None and spot_casters.shape[0]:
        def scan_spot_sh(total, packed):
            lrow, extra, vis = packed
            c = _spot_light_radiance(lrow, extra, world_pos, normal, v,
                                     albedo, roughness, metalness)
            return total + c * vis[..., None], None
        total, _ = jax.lax.scan(scan_spot_sh, total,
                                (spot_casters, spot_caster_extra, spot_shadow))

    dir_contrib = directional_light_radiance(
        directional, normal, v, albedo, roughness, metalness)
    if dir_shadow is not None:
        # shadowing flag rides in drow[8]; blend like ForwardLighting.hlsl:360-376
        shadowing = directional[8]
        factor = jnp.where(shadowing > 0, dir_shadow, jnp.ones_like(dir_shadow))
        dir_contrib = dir_contrib * factor[..., None]
    total = total + dir_contrib

    return total
