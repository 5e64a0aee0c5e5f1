"""AMD FidelityFX compute passes, TPU-native — counterparts of the
reference's vendored ffx_cas.h / ffx_fsr1.h / ffx_spd.h HLSL
(Shaders/AMDFidelityFX.hlsl drivers, SceneRendering.cpp:2507-2788):

- CAS   (Contrast Adaptive Sharpening)
- FSR1  EASU (edge-adaptive spatial upsampling) + RCAS (robust CAS)
- SPD   (single-pass downsampler -> mip pyramid; "single-pass" is a GPU
        scheduling trick — here successive reductions fuse under jit)

These are behavioral reimplementations of the published algorithms as
vectorized jnp over [H, W, 3] images (no translation of the vendored code).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Neighbor fetch with edge clamp."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# CAS (ffx_cas.h behavior; reference runs it disabled by default,
# PostProcess.h:24, but it is part of the chain)
# ---------------------------------------------------------------------------

def cas(img: jnp.ndarray, sharpness: float = 0.0) -> jnp.ndarray:
    """Contrast Adaptive Sharpening. img linear [H, W, 3], sharpness 0..1."""
    b = _shift(img, -1, 0)
    d = _shift(img, 0, -1)
    e = img
    f = _shift(img, 0, 1)
    h = _shift(img, 1, 0)
    a = _shift(img, -1, -1)
    c = _shift(img, -1, 1)
    g = _shift(img, 1, -1)
    i = _shift(img, 1, 1)

    mn = jnp.minimum(jnp.minimum(jnp.minimum(d, e), jnp.minimum(f, b)), h)
    mn2 = jnp.minimum(mn, jnp.minimum(jnp.minimum(a, c), jnp.minimum(g, i)))
    mn = mn + mn2
    mx = jnp.maximum(jnp.maximum(jnp.maximum(d, e), jnp.maximum(f, b)), h)
    mx2 = jnp.maximum(mx, jnp.maximum(jnp.maximum(a, c), jnp.maximum(g, i)))
    mx = mx + mx2

    rcp_mx = 1.0 / jnp.maximum(mx, 1e-5)
    amp = jnp.clip(jnp.minimum(mn, 2.0 - mx) * rcp_mx, 0.0, 1.0)
    amp = jnp.sqrt(amp)
    # developer knob: peak in [-1/5, -1/8]
    peak = -1.0 / (8.0 - 3.0 * float(np.clip(sharpness, 0.0, 1.0)))
    w = amp * peak
    return (w * (b + d + f + h) + e) / (4.0 * w + 1.0)


# ---------------------------------------------------------------------------
# FSR1 RCAS (ffx_fsr1.h FsrRcas* behavior)
# ---------------------------------------------------------------------------

_RCAS_LIMIT = 0.25 - 1.0 / 16.0


def rcas(img: jnp.ndarray, sharpness_stops: float = 0.2) -> jnp.ndarray:
    """Robust Contrast Adaptive Sharpening (FSR1's sharpening pass).
    sharpness_stops: 0 = max sharpness, larger = softer (2^-stops)."""
    sharp = float(np.exp2(-sharpness_stops))
    b = _shift(img, -1, 0)
    d = _shift(img, 0, -1)
    e = img
    f = _shift(img, 0, 1)
    h = _shift(img, 1, 0)

    mn = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
    mn = jnp.minimum(mn, e)
    mx = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
    mx = jnp.maximum(mx, e)
    hit_min = mn / jnp.maximum(4.0 * mx, 1e-5)
    hit_max = (1.0 - mx) / jnp.minimum(4.0 * mn - 4.0, -1e-5)
    lobe_rgb = jnp.maximum(-hit_min, hit_max)
    lobe = jnp.clip(jnp.max(lobe_rgb, axis=-1, keepdims=True),
                    -_RCAS_LIMIT, 0.0) * sharp
    return (lobe * (b + d + f + h) + e) / (4.0 * lobe + 1.0)


# ---------------------------------------------------------------------------
# FSR1 EASU (ffx_fsr1.h FsrEasu* behavior): 12-tap edge-adaptive upsample
# ---------------------------------------------------------------------------

def _easu_luma(c: jnp.ndarray) -> jnp.ndarray:
    # EASU uses R*0.5 + G + B*0.5 as its luma proxy
    return 0.5 * c[..., 0] + c[..., 1] + 0.5 * c[..., 2]


def easu(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Edge-adaptive spatial upsampling: analyze local gradients of the
    source, then apply a direction/length-adaptive elliptical lanczos-like
    kernel over the 12-tap neighborhood. img [h, w, 3] -> [out_h, out_w, 3].
    """
    h, w = img.shape[0], img.shape[1]
    # source sample position per output pixel
    oy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    ox = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    px = jnp.broadcast_to(ox[None, :], (out_h, out_w))
    py = jnp.broadcast_to(oy[:, None], (out_h, out_w))
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(dy, dx):
        yy = jnp.clip(y0i + dy, 0, h - 1)
        xx = jnp.clip(x0i + dx, 0, w - 1)
        return img[yy, xx]

    # 12-tap pattern:      b c
    #                    e f g h
    #                    i j k l
    #                      n o
    tb = tap(-1, 0); tc = tap(-1, 1)
    te = tap(0, -1); tf = tap(0, 0); tg = tap(0, 1); th = tap(0, 2)
    ti = tap(1, -1); tj = tap(1, 0); tk = tap(1, 1); tl = tap(1, 2)
    tn = tap(2, 0); to = tap(2, 1)

    lb, lc = _easu_luma(tb), _easu_luma(tc)
    le, lf, lg, lh = map(_easu_luma, (te, tf, tg, th))
    li, lj, lk, ll = map(_easu_luma, (ti, tj, tk, tl))
    ln, lo = _easu_luma(tn), _easu_luma(to)

    # directional analysis at the 4 nearest texels (f, g, j, k), blended
    # bilinearly — per FsrEasuSet
    def analysis(l_up, l_left, l_center, l_right, l_down):
        dx = l_right - l_left
        dy = l_down - l_up
        dirx, diry = dx, dy
        # edge strength: 1 - |second derivative| / range
        lenx = jnp.clip(jnp.abs(dx) /
                        jnp.maximum(jnp.maximum(l_right, l_left) -
                                    jnp.minimum(l_right, l_left) + 1e-5, 1e-5),
                        0.0, 1.0)
        leny = jnp.clip(jnp.abs(dy) /
                        jnp.maximum(jnp.maximum(l_down, l_up) -
                                    jnp.minimum(l_down, l_up) + 1e-5, 1e-5),
                        0.0, 1.0)
        length = lenx * lenx + leny * leny
        return dirx, diry, length

    dfx, dfy, flen = analysis(lb, le, lf, lg, lj)
    dgx, dgy, glen = analysis(lc, lf, lg, lh, lk)
    djx, djy, jlen = analysis(lf, li, lj, lk, ln)
    dkx, dky, klen = analysis(lg, lj, lk, ll, lo)

    wf = (1 - fx) * (1 - fy)
    wg = fx * (1 - fy)
    wj = (1 - fx) * fy
    wk = fx * fy
    dirx = dfx * wf + dgx * wg + djx * wj + dkx * wk
    diry = dfy * wf + dgy * wg + djy * wj + dky * wk
    length = flen * wf + glen * wg + jlen * wj + klen * wk

    # normalize direction; degenerate -> axis-aligned (no rotation)
    dl = jnp.sqrt(dirx * dirx + diry * diry)
    valid = dl > 1e-5
    dirx = jnp.where(valid, dirx / jnp.maximum(dl, 1e-9), 1.0)
    diry = jnp.where(valid, diry / jnp.maximum(dl, 1e-9), 0.0)
    stretch = 1.0 + 0.5 * jnp.clip(length, 0.0, 2.0)  # elongate along edge

    def kernel_weight(dy, dx):
        # rotate offset into edge frame, squash across the edge
        vx = (dx - fx) * dirx + (dy - fy) * diry
        vy = -(dx - fx) * diry + (dy - fy) * dirx
        vx = vx / stretch
        d2 = vx * vx + vy * vy
        # lanczos-like window: (25/16 (2/5 d2 - 1)^2 - 9/16) * (d2/4 - 1)^2
        d2 = jnp.minimum(d2, 4.0)
        wA = 0.4 * d2 - 1.0
        wB = 0.25 * d2 - 1.0
        return (25.0 / 16.0 * wA * wA - 9.0 / 16.0) * wB * wB

    taps = [(-1, 0, tb), (-1, 1, tc), (0, -1, te), (0, 0, tf), (0, 1, tg),
            (0, 2, th), (1, -1, ti), (1, 0, tj), (1, 1, tk), (1, 2, tl),
            (2, 0, tn), (2, 1, to)]
    acc = jnp.zeros((out_h, out_w, 3))
    wsum = jnp.zeros((out_h, out_w))
    # deringing clamp bounds from the 4 nearest taps
    lo_c = jnp.minimum(jnp.minimum(tf, tg), jnp.minimum(tj, tk))
    hi_c = jnp.maximum(jnp.maximum(tf, tg), jnp.maximum(tj, tk))
    for dy, dx, col in taps:
        wt = kernel_weight(float(dy), float(dx))
        acc = acc + col * wt[..., None]
        wsum = wsum + wt
    out = acc / jnp.maximum(wsum, 1e-5)[..., None]
    return jnp.clip(out, lo_c, hi_c)


def fsr1(img: jnp.ndarray, out_h: int, out_w: int,
         sharpness_stops: float = 0.2) -> jnp.ndarray:
    """FSR1 = EASU upscale + RCAS sharpen (the reference's post chain when
    RenderScale < 1, SceneRendering.cpp:2507-2788; HDR path skips FSR)."""
    return rcas(easu(img, out_h, out_w), sharpness_stops)


# ---------------------------------------------------------------------------
# SPD mip pyramid (ffx_spd.h capability: full mip chain in "one pass";
# used for the depth hierarchy feeding SSSR, Renderer.cpp:506-513)
# ---------------------------------------------------------------------------

def spd_mip_pyramid(img: jnp.ndarray, num_mips: int | None = None,
                    reduce: str = "mean") -> list[jnp.ndarray]:
    """-> [img, mip1, mip2, ...]; reduce in {mean, min, max}.
    Odd dimensions are truncated like GPU mip chains."""
    ops = {"mean": jnp.mean, "min": jnp.min, "max": jnp.max}[reduce]
    mips = [img]
    cur = img
    while (num_mips is None or len(mips) < num_mips) and min(cur.shape[:2]) >= 2:
        h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
        t = cur[: h2 * 2, : w2 * 2]
        if t.ndim == 3:
            t = t.reshape(h2, 2, w2, 2, -1)
            cur = ops(t, axis=(1, 3))
        else:
            t = t.reshape(h2, 2, w2, 2)
            cur = ops(t, axis=(1, 3))
        mips.append(cur)
    return mips
