"""Post-process chain — counterpart of the reference CS chain
(SceneRendering.cpp:2507-2788): gaussian blur, tonemapper
(Shaders/Tonemapper.hlsl), FFX-CAS sharpen, FFX-FSR1 EASU/RCAS upscale.

This module implements the tonemapper (Reinhard + sRGB / ST2084 HDR10 /
linear output curves, Tonemapper.hlsl:110-151) and the separable gaussian
blur (GaussianBlur.hlsl). CAS and FSR1 live in ops/ffx.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import colorspace as cs


def tonemap_reinhard(color: jnp.ndarray) -> jnp.ndarray:
    """Tonemapper.hlsl:24-27: c / (c + 1)."""
    return color / (color + 1.0)


def tonemap(color: jnp.ndarray,
            output_display_curve: int = cs.DISPLAY_CURVE_SRGB,
            content_color_space: int = cs.COLOR_SPACE_REC709,
            display_reference_brightness: float = 200.0,
            apply_gamma: bool = True) -> jnp.ndarray:
    """The tonemapper CS (Tonemapper.hlsl:110-151).

    - sRGB path: Reinhard, then the exact piecewise sRGB curve if
      apply_gamma (ToggleGammaCorrection).
    - ST2084 path: optional Rec709->Rec2020, scale by
      brightness/ST2084_MAX, PQ curve. No tonemap operator (HDR10 output).
    - linear path: passthrough.
    """
    if output_display_curve == cs.DISPLAY_CURVE_SRGB:
        out = tonemap_reinhard(color)
        if apply_gamma:
            out = cs.linear_to_srgb_fast(out)
        return out
    if output_display_curve == cs.DISPLAY_CURVE_ST2084:
        out = color
        if content_color_space == cs.COLOR_SPACE_REC709:
            out = cs.rec709_to_rec2020(out)
        scale = display_reference_brightness / cs.ST2084_MAX
        return cs.linear_to_st2084(out * scale)
    return color


# ---------------------------------------------------------------------------
# separable gaussian blur (GaussianBlur.hlsl behavior: X pass then Y pass)
# ---------------------------------------------------------------------------

def _gaussian_kernel(radius: int, sigma: float) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, radius: int = 4, sigma: float = 2.0) -> jnp.ndarray:
    """img [H, W, C] -> blurred [H, W, C]; separable X then Y with edge
    clamp (matches the naive CS pair in GaussianBlur.hlsl)."""
    k = jnp.asarray(_gaussian_kernel(radius, sigma))
    def blur_axis(x, axis):
        out = jnp.zeros_like(x)
        for i, w in enumerate(_gaussian_kernel(radius, sigma)):
            shift = i - radius
            rolled = jnp.roll(x, -shift, axis=axis)
            # edge clamp: rolling wraps; overwrite wrapped region with edge
            idx = jnp.arange(x.shape[axis]) + shift
            idx = jnp.clip(idx, 0, x.shape[axis] - 1)
            rolled = jnp.take(x, idx, axis=axis)
            out = out + float(w) * rolled
        return out
    del k
    return blur_axis(blur_axis(img, 1), 0)
