"""Color-space conversions — counterpart of Shaders/HDR.hlsl
(LinearToSRGB/SRGBToLinear exact piecewise curves, Rec709<->Rec2020
primaries, ST.2084 PQ curve) and ShadingMath.hlsl SRGBToLinear (pow 2.2).

All functions are jnp, elementwise over [..., 3] tensors.
"""
from __future__ import annotations

import jax.numpy as jnp

# PQ reference display (HDR.hlsl:44)
ST2084_MAX = 10000.0

# display curve enum (HDR.hlsl:35-37)
DISPLAY_CURVE_SRGB = 0
DISPLAY_CURVE_ST2084 = 1
DISPLAY_CURVE_LINEAR = 2

# color space enum (HDR.hlsl:40-41)
COLOR_SPACE_REC709 = 0
COLOR_SPACE_REC2020 = 1


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """HDR.hlsl:76-80 exact piecewise sRGB OETF."""
    c = jnp.asarray(c)
    return jnp.where(c < 0.0031308,
                     12.92 * c,
                     1.055 * jnp.power(jnp.abs(c), 1.0 / 2.4) - 0.055)


def linear_to_srgb_fast(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB OETF with the x^(1/2.4) replaced by a 2-sqrt polynomial
    (max |error| 7e-4 sRGB units on [0.0031308, 1] — 5.6x under one 8-bit
    step). jnp.power is a multi-pass transcendental on the TPU VPU (~5 ms
    for a 1080p RGB frame); sqrt is single-pass. Matches the curve of
    HDR.hlsl:76-80, not its instruction sequence."""
    c = jnp.asarray(c)
    x = jnp.clip(c, 0.0, 1.0)
    u2 = jnp.sqrt(x)      # c^0.5
    u4 = jnp.sqrt(u2)     # c^0.25
    p = 0.11983648 * u4 + 1.23117423 * u2 - 0.49498088 * u2 * u4 + 0.14414322 * x
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * p - 0.055)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """HDR.hlsl:82-86 exact piecewise sRGB EOTF."""
    c = jnp.asarray(c)
    return jnp.where(c < 0.04045,
                     c / 12.92,
                     jnp.power(jnp.abs(c + 0.055) / 1.055, 2.4))


def srgb_to_linear_fast(c: jnp.ndarray) -> jnp.ndarray:
    """ShadingMath.hlsl:65 — the pow-2.2 approximation the forward-lighting
    shader uses for albedo/emissive decode."""
    return jnp.power(jnp.maximum(c, 0.0), 2.2)


_REC709_TO_REC2020 = jnp.array(
    [[0.627402, 0.329292, 0.043306],
     [0.069095, 0.919544, 0.011360],
     [0.016394, 0.088028, 0.895578]], dtype=jnp.float32)

_REC2020_TO_REC709 = jnp.array(
    [[1.660496, -0.587656, -0.072840],
     [-0.124547, 1.132895, -0.008348],
     [-0.018154, -0.100597, 1.118751]], dtype=jnp.float32)


def rec709_to_rec2020(c: jnp.ndarray) -> jnp.ndarray:
    return c @ _REC709_TO_REC2020.T


def rec2020_to_rec709(c: jnp.ndarray) -> jnp.ndarray:
    return c @ _REC2020_TO_REC709.T


def linear_to_st2084(c: jnp.ndarray) -> jnp.ndarray:
    """HDR.hlsl:110-119 PQ curve (input normalized to ST2084_MAX)."""
    m1 = 2610.0 / 4096.0 / 4
    m2 = 2523.0 / 4096.0 * 128
    c1 = 3424.0 / 4096.0
    c2 = 2413.0 / 4096.0 * 32
    c3 = 2392.0 / 4096.0 * 32
    cp = jnp.power(jnp.abs(c), m1)
    return jnp.power((c1 + c2 * cp) / (1.0 + c3 * cp), m2)
