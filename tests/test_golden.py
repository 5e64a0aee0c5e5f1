"""Golden-frame regression tests: render fixed configs and compare against
checked-in goldens with SSIM (the reference's visual smoke-test discipline,
SURVEY.md §4, made quantitative). Regenerate with
`python tests/test_golden.py --regen` after intentional visual changes."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
SSIM_THRESHOLD = 0.985


def render_config(name: str) -> np.ndarray:
    from vqengine_tpu.engine.cli import parse_command_line
    from vqengine_tpu.engine.engine import VQEngineTPU

    cfgs = {
        "hello_triangle": ("HelloTriangle", dict(ssao=False, msaa=False, ssr=False)),
        "hello_cube": ("HelloCube", dict(ssao=False, msaa=False, ssr=False)),
        "hello_cube_msaa": ("HelloCube", dict(ssao=False, msaa=True, ssr=False)),
        "default_scene": ("Default", dict(ssao=False, msaa=False, ssr=False,
                                          shadow_dims=(64, 64, 64))),
    }
    scene, opts = cfgs[name]
    e = VQEngineTPU(startup=parse_command_line(
        [f"-W=192", f"-H=108", f"-Scene={scene}"]))
    e.gfx.bAmbientOcclusion = opts.get("ssao", False)
    e.gfx.bAntiAliasing = opts.get("msaa", False)
    e.gfx.Reflections = 1 if opts.get("ssr", False) else 0
    e.gfx.bDrawLightBounds = True
    if not e.start_loading_scene(scene):
        pytest.skip(f"scene {scene} unavailable")
    cam = e.cameras[0]
    consts = e.renderer.build_frame_constants(e.scene_buffers, cam, e.lights)
    out = e.renderer.render(consts, 192, 108, env=e.environment,
                            enable_ssao=e.gfx.bAmbientOcclusion,
                            msaa=e.gfx.bAntiAliasing,
                            enable_ssr=bool(e.gfx.Reflections),
                            textures=e.texture_arrays,
                            shadow_dims=opts.get("shadow_dims"))
    return np.asarray(out.ldr)


CONFIGS = ["hello_triangle", "hello_cube", "hello_cube_msaa", "default_scene"]


@pytest.mark.parametrize("name", CONFIGS)
def test_golden(name):
    from vqengine_tpu.utils.image_io import read_png
    from vqengine_tpu.utils.ssim import ssim

    golden_path = GOLDEN_DIR / f"{name}.png"
    if not golden_path.is_file():
        pytest.skip(f"golden {name} not generated yet (run --regen)")
    img = render_config(name)
    golden = read_png(golden_path).astype(np.float32)[:, :, :3] / 255.0
    score = ssim(img, golden)
    assert score >= SSIM_THRESHOLD, f"{name}: SSIM {score:.4f} < {SSIM_THRESHOLD}"


def regen():
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vqengine_tpu.utils.image_io import write_png
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name in CONFIGS:
        img = render_config(name)
        write_png(GOLDEN_DIR / f"{name}.png", img)
        print(f"wrote golden {name}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        regen()
