"""Texture sampling — the shading-time counterpart of the reference's
sampler states + Texture2D.Sample calls (ForwardLighting.hlsl:81-102:
linear/point/aniso samplers over 9 material texture slots).

Textures live in array-of-textures mip tensors ([N, S, S, 4] per level,
from scene/texture_manager.py); every pixel carries a per-slot texture id
so one vectorized pass samples the whole screen.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def uv_mip_level(uv: jnp.ndarray, tex_size: int, max_mip: int,
                 bias: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Per-pixel LOD from screen-space uv derivatives (the hardware
    ddx/ddy): uv [H, W, 2] -> lod [H, W]."""
    du_dx = jnp.abs(uv[..., 0] - jnp.roll(uv[..., 0], 1, axis=1))
    dv_dx = jnp.abs(uv[..., 1] - jnp.roll(uv[..., 1], 1, axis=1))
    du_dy = jnp.abs(uv[..., 0] - jnp.roll(uv[..., 0], 1, axis=0))
    dv_dy = jnp.abs(uv[..., 1] - jnp.roll(uv[..., 1], 1, axis=0))
    rho = jnp.maximum(jnp.sqrt(du_dx ** 2 + dv_dx ** 2),
                      jnp.sqrt(du_dy ** 2 + dv_dy ** 2))
    lod = jnp.log2(jnp.maximum(rho * tex_size, 1e-6)) + bias
    return jnp.clip(lod, 0.0, max_mip)


def _bilinear_from_level(level: jnp.ndarray, tex_id: jnp.ndarray,
                         uv: jnp.ndarray) -> jnp.ndarray:
    """level [N, s, s, 4], tex_id [H, W], uv [H, W, 2] (wrap) -> [H, W, 4]."""
    s = level.shape[1]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), s)
    x1i = jnp.mod(x0i + 1, s)
    y0i = jnp.mod(y0.astype(jnp.int32), s)
    y1i = jnp.mod(y0i + 1, s)
    t = jnp.maximum(tex_id, 0)
    c00 = level[t, y0i, x0i]
    c10 = level[t, y0i, x1i]
    c01 = level[t, y1i, x0i]
    c11 = level[t, y1i, x1i]
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def sample_texture_array(mips: list[jnp.ndarray], tex_id: jnp.ndarray,
                         uv: jnp.ndarray, lod: jnp.ndarray | None = None
                         ) -> jnp.ndarray:
    """Mip-mapped bilinear sample: mips list of [N, s_m, s_m, 4],
    tex_id [H, W] (negative = slot unused; callers mask via Has*Map),
    uv [H, W, 2] -> rgba [H, W, 4]. Nearest-mip selection (the reference
    point-samples mips for most slots; trilinear can come later).

    All (texture, mip) levels flatten into ONE table and the per-pixel
    level pick happens in index arithmetic, so a full bilinear sample is
    exactly 4 gathers total — not 4 per mip level (TPU gathers are the
    cost; the level loop below is cheap VPU where-selects)."""
    if lod is None:
        lod = uv_mip_level(uv, mips[0].shape[1], len(mips) - 1)
    lodi = jnp.clip(lod.astype(jnp.int32), 0, len(mips) - 1)

    flat_parts, offs = [], []
    off = 0
    for level in mips:
        n, s = level.shape[0], level.shape[1]
        flat_parts.append(level.reshape(-1, 4))
        offs.append(off)
        off += n * s * s
    flat = jnp.concatenate(flat_parts, axis=0)

    t = jnp.maximum(tex_id, 0)
    shape = uv.shape[:-1]
    i00 = jnp.zeros(shape, jnp.int32)
    i10 = jnp.zeros(shape, jnp.int32)
    i01 = jnp.zeros(shape, jnp.int32)
    i11 = jnp.zeros(shape, jnp.int32)
    fx = jnp.zeros(shape, jnp.float32)
    fy = jnp.zeros(shape, jnp.float32)
    for m, level in enumerate(mips):
        s = level.shape[1]
        if s < 1:
            continue
        x = uv[..., 0] * s - 0.5
        y = uv[..., 1] * s - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        x0i = jnp.mod(x0.astype(jnp.int32), s)
        x1i = jnp.mod(x0i + 1, s)
        y0i = jnp.mod(y0.astype(jnp.int32), s)
        y1i = jnp.mod(y0i + 1, s)
        base = offs[m] + t * (s * s)
        hit = lodi == m
        i00 = jnp.where(hit, base + y0i * s + x0i, i00)
        i10 = jnp.where(hit, base + y0i * s + x1i, i10)
        i01 = jnp.where(hit, base + y1i * s + x0i, i01)
        i11 = jnp.where(hit, base + y1i * s + x1i, i11)
        fx = jnp.where(hit, x - x0, fx)
        fy = jnp.where(hit, y - y0, fy)
    fx = fx[..., None]
    fy = fy[..., None]
    c00 = flat[i00].astype(jnp.float32)
    c10 = flat[i10].astype(jnp.float32)
    c01 = flat[i01].astype(jnp.float32)
    c11 = flat[i11].astype(jnp.float32)
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def unpack_normal_map(sampled: jnp.ndarray, world_normal: jnp.ndarray,
                      world_tangent: jnp.ndarray) -> jnp.ndarray:
    """UnpackNormal (ShadingMath.hlsl:44-52): tangent-space normal map ->
    world space via Gram-Schmidt TBN."""
    n_ts = sampled * 2.0 - 1.0
    n = world_normal / jnp.maximum(
        jnp.linalg.norm(world_normal, axis=-1, keepdims=True), 1e-9)
    t = world_tangent - (n * world_tangent).sum(-1, keepdims=True) * n
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(t, n)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
    out = n_ts[..., 0:1] * t + n_ts[..., 1:2] * b + n_ts[..., 2:3] * n
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)