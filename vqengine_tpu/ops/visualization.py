"""Debug visualization passes — counterparts of Visualization.hlsl (draw-
mode debug views: depth/normals/roughness/metallic/AO/motion/LOD,
SceneRendering.cpp:2541-2576), Magnifier.hlsl (screen-space lens,
MagnifierPass.{h,cpp}) and Outline.hlsl (stencil-based selected-object
outline, OutlinePass.{h,cpp} — stencil becomes an object-id mask here).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# EDrawMode analog (reference Settings.h / VQUI draw modes)
DRAW_MODE_LIT = 0
DRAW_MODE_DEPTH = 1
DRAW_MODE_NORMALS = 2
DRAW_MODE_ROUGHNESS = 3
DRAW_MODE_METALLIC = 4
DRAW_MODE_AO = 5
DRAW_MODE_ALBEDO = 6
DRAW_MODE_MOTION_VECTORS = 7
DRAW_MODE_OBJECT_ID = 8


def visualize(mode: int, ldr: jnp.ndarray, depth: jnp.ndarray | None = None,
              normals: jnp.ndarray | None = None,
              roughness: jnp.ndarray | None = None,
              metalness: jnp.ndarray | None = None,
              ao: jnp.ndarray | None = None,
              albedo: jnp.ndarray | None = None,
              motion: jnp.ndarray | None = None,
              object_id: jnp.ndarray | None = None) -> jnp.ndarray:
    """Debug-view CS equivalent: convert G-buffer channels to a displayable
    image (Visualization.hlsl behavior)."""
    if mode == DRAW_MODE_LIT or ldr is None and mode == DRAW_MODE_LIT:
        return ldr
    if mode == DRAW_MODE_DEPTH and depth is not None:
        # linearize-ish for display: near=white far=black like the reference
        d = jnp.clip(1.0 - depth, 0.0, 1.0)
        d = jnp.power(d, 0.25)
        return jnp.stack([d, d, d], axis=-1)
    if mode == DRAW_MODE_NORMALS and normals is not None:
        return normals * 0.5 + 0.5
    if mode == DRAW_MODE_ROUGHNESS and roughness is not None:
        return jnp.stack([roughness] * 3, axis=-1)
    if mode == DRAW_MODE_METALLIC and metalness is not None:
        return jnp.stack([metalness] * 3, axis=-1)
    if mode == DRAW_MODE_AO and ao is not None:
        return jnp.stack([ao] * 3, axis=-1)
    if mode == DRAW_MODE_ALBEDO and albedo is not None:
        return albedo
    if mode == DRAW_MODE_MOTION_VECTORS and motion is not None:
        m = jnp.clip(motion * 8.0 + 0.5, 0.0, 1.0)
        return jnp.concatenate([m, jnp.full_like(m[..., :1], 0.5)], axis=-1)
    if mode == DRAW_MODE_OBJECT_ID and object_id is not None:
        # hash ids to colors (uint32 to avoid int32 literal overflow)
        oid = jnp.maximum(object_id, 0).astype(jnp.uint32)
        r = ((oid * np.uint32(2654435761)) % 255).astype(jnp.float32) / 255.0
        g = ((oid * np.uint32(40503)) % 255).astype(jnp.float32) / 255.0
        b = ((oid * np.uint32(69069)) % 255).astype(jnp.float32) / 255.0
        bg = object_id < 0
        return jnp.where(bg[..., None], 0.0, jnp.stack([r, g, b], axis=-1))
    return ldr


def magnifier(img: jnp.ndarray, center_uv=(0.5, 0.5), radius: float = 0.15,
              magnification: float = 3.0,
              border_color=(1.0, 0.8, 0.1), border_px: int = 2) -> jnp.ndarray:
    """Magnifier lens (Magnifier.hlsl): pixels inside the lens circle sample
    the source at reduced offsets from the lens center."""
    h, w = img.shape[:2]
    ys = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
    cx, cy = center_uv
    dx = xs - cx
    dy = ys - cy
    # circular in screen aspect: scale x by aspect
    aspect = w / h
    dist = jnp.sqrt((dx * aspect) ** 2 + dy ** 2)
    inside = dist < radius

    su = cx + dx / magnification
    sv = cy + dy / magnification
    tx = jnp.clip((su * w).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip((sv * h).astype(jnp.int32), 0, h - 1)
    magnified = img.reshape(-1, img.shape[-1])[ty * w + tx]
    out = jnp.where(inside[..., None], magnified, img)

    ring = (dist >= radius) & (dist < radius + border_px / h)
    return jnp.where(ring[..., None], jnp.asarray(border_color), out)


def outline(img: jnp.ndarray, object_id: jnp.ndarray, selected: int,
            color=(1.0, 0.6, 0.1), thickness: int = 2) -> jnp.ndarray:
    """Selected-object outline (Outline.hlsl: stencil grow) — dilate the
    selection mask and draw the rim."""
    mask = object_id == selected
    grown = mask
    for _ in range(thickness):
        g = grown
        g = g | jnp.roll(g, 1, 0) | jnp.roll(g, -1, 0)
        g = g | jnp.roll(g, 1, 1) | jnp.roll(g, -1, 1)
        grown = g
    rim = grown & ~mask
    return jnp.where(rim[..., None], jnp.asarray(color), img)
