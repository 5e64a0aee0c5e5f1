"""Render TPU goldens of the bench (Sponza-stress) frame and diff the
MSAA path against the non-MSAA G-buffer path on-chip — the check that
pins down any TPU-only divergence between the two raster paths (a CPU
suite can't see TPU-specific numerics). Writes PNGs under
tests/goldens/tpu/ and prints SSIM scores; run alone (one axon client).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import build_sponza_stress  # noqa: E402

OUT = Path("tests/goldens/tpu")


def main() -> None:
    from vqengine_tpu.engine.engine import _enable_compilation_cache
    _enable_compilation_cache()

    import jax

    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters
    from vqengine_tpu.utils.image_io import read_png, write_png
    from vqengine_tpu.utils.ssim import ssim

    width, height = 960, 540
    buffers, lights, textures = build_sponza_stress()
    scene = graph.upload_scene(buffers)
    env = graph.build_environment(procedural_sky_equirect(512, 256))
    slots_used = graph.slots_used_of(buffers.materials)

    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg, p.yaw_deg = 15.0, -90.0
    p.fov_v_deg, p.near_z, p.far_z = 60.0, 0.5, 4000.0
    cam = Camera(p, aspect=width / height)
    r = VQRendererTPU()
    consts = r.build_frame_constants(buffers, cam, lights)
    shadow_maps = jax.jit(graph.render_shadow_maps)(scene, consts)

    def render(msaa: bool):
        out = jax.jit(lambda s, c: graph.render_forward(
            s, c, width=width, height=height, enable_shadows=True,
            enable_ssao=True, enable_ssr=True, msaa=msaa,
            textures=textures, aniso_taps=2, slots_used=slots_used,
            env=env, shadow_maps=shadow_maps))(scene, consts)
        return np.asarray(out["ldr"])

    img_msaa = render(True)
    img_nomsaa = render(False)
    OUT.mkdir(parents=True, exist_ok=True)
    cross = ssim(img_msaa, img_nomsaa)
    print(f"SSIM msaa vs no-msaa (on-TPU): {cross:.4f}")
    assert np.isfinite(img_msaa).all() and np.isfinite(img_nomsaa).all()

    for name, img in (("sponza_stress_msaa", img_msaa),
                      ("sponza_stress", img_nomsaa)):
        path = OUT / f"{name}.png"
        if path.is_file():
            prev = read_png(path).astype(np.float32)[:, :, :3] / 255.0
            print(f"SSIM vs stored {name}: {ssim(img, prev):.4f}")
        write_png(path, img)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
