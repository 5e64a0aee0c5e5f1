"""Texture gather cost vs TABLE SIZE (VERDICT r2 #3): the quad-packed
sampling fast path was only ever measured with 128^2 procedural maps
(~0.3 MB tables); real Sponza ships 1024^2+ maps. Measures one bilinear
tap (ONE 16B row gather) per pixel at 1080p from quad-packed tables built
at 128/256/512/1024 base size, with screen-coherent uv, plus a 32B-row
variant (the proposed fused diffuse+aux row). Run alone on the TPU."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqengine_tpu.ops import texture as tex
    from vqengine_tpu.scene.texture_manager import (brick, checkerboard,
                                                    generate_mips)

    h, w = 1080, 1920
    n_frames = 8

    @jax.jit
    def nop(t):
        return t + 1

    def timed(name, run):
        np.asarray(run(jnp.int32(0)))
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(nop(jnp.zeros(2)))
        floor = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(1)))
        ms = (time.perf_counter() - t0 - floor) / n_frames * 1e3
        print(f"{name:44s} {ms:7.2f} ms/frame", flush=True)

    # screen-coherent uv: a floor-like ramp with 4x tiling + mild rotation
    ys = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    xs = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    uv_np = np.stack(np.broadcast_arrays(xs * 4.0 + ys * 0.3, ys * 4.0),
                     axis=-1).astype(np.float32)
    uv = jnp.asarray(uv_np)
    tex_id = jnp.asarray((np.add.outer(ys[:, 0] * 2, xs[0] * 2) % 5)
                         .astype(np.int32))
    jit_map = tex.mip_jitter(h, w)

    for size in (128, 256, 512, 1024):
        maps = [checkerboard(size, 8), brick(size),
                checkerboard(size, 4, (0.8, 0.78, 0.72), (0.7, 0.68, 0.65)),
                checkerboard(size, 16), brick(size)]
        per = [generate_mips(m) for m in maps]
        nl = len(per[0])
        packed = tex.pack_texture_quads(
            [np.stack([m[l] for m in per]) for l in range(nl)])
        mb = packed.flat.size * 4 / 1e6

        def one_tap(i, packed=packed):
            def body(c, k):
                u = uv + k.astype(jnp.float32) * 1e-4
                s = tex.sample_texture_array(packed, tex_id, u,
                                             jitter=jit_map)
                return c + s.sum(), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_frames, dtype=jnp.int32))
            return tot

        timed(f"{size:5d}^2 x5 quad-packed ({mb:6.1f} MB) 1 tap",
              jax.jit(one_tap))

        def three_tap(i, packed=packed):
            def body(c, k):
                u = uv + k.astype(jnp.float32) * 1e-4
                a = tex.sample_texture_array_aniso(packed, tex_id, u,
                                                   num_taps=2,
                                                   jitter=jit_map)
                b = tex.sample_texture_array(packed, tex_id, u * 1.01,
                                             jitter=jit_map)
                return c + a.sum() + b.sum(), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_frames, dtype=jnp.int32))
            return tot

        timed(f"{size:5d}^2 x5 aniso2+aux (bench tex load)",
              jax.jit(three_tap))

    # 32B-row fetch: does doubling the row width cost anything? (the
    # proposed fused diffuse+aux row). Rows = 8 int32 lanes.
    rng = np.random.default_rng(0)
    for size in (256, 512, 1024):
        q = (size // 2) ** 2 * 4 * 5
        tbl = jnp.asarray(rng.integers(0, 2**31, (q, 8), dtype=np.int64)
                          .astype(np.int32))
        idx_np = (np.add.outer((ys[:, 0] * (q - 7)).astype(np.int64),
                               (xs[0] * 7).astype(np.int64)) % q)
        idx = jnp.asarray(idx_np.astype(np.int32))

        def wide(i, tbl=tbl, idx=idx):
            def body(c, k):
                r = tbl[jnp.minimum(idx + k, q - 1)]
                return c + r.astype(jnp.float32).sum(), ()
            tot, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_frames, dtype=jnp.int32))
            return tot

        timed(f"rows32B coherent from {q*32/1e6:7.1f} MB", jax.jit(wide))


if __name__ == "__main__":
    main()
