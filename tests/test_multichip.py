"""Multi-chip screen-band + frame sharding on the virtual 8-device CPU
mesh — validates the same path the driver's dryrun compiles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqengine_tpu.parallel import multichip
from vqengine_tpu.render import graph
from vqengine_tpu.render.renderer import VQRendererTPU
from vqengine_tpu.render.scene_buffers import DrawItem, build_scene_buffers
from vqengine_tpu.scene.camera import Camera, FCameraParameters
from vqengine_tpu.scene.light import ELightType, Light
from vqengine_tpu.scene.material import Material
from vqengine_tpu.scene import mesh as meshmod
from vqengine_tpu.utils import math3d as m3

W, H = 128, 64


def tiny_scene():
    items = [
        DrawItem("cube", meshmod.cube(), m3.Transform(), 0, 0),
        DrawItem("sphere", meshmod.sphere(0.8, 12, 12),
                 m3.Transform(position=np.array([2.0, 0, 0], np.float32)), 0, 1),
    ]
    return build_scene_buffers(items, [Material(name="m")])


def camera(eye=(0, 1.5, -5)):
    p = FCameraParameters()
    p.position = np.array(eye, np.float32)
    p.fov_v_deg = 60
    p.near_z = 0.1
    p.far_z = 100
    cam = Camera(p, aspect=W / H)
    return cam


def consts_for(buffers, cam):
    r = VQRendererTPU()
    light = Light(type=ELightType.DIRECTIONAL, brightness=1.5)
    return r.build_frame_constants(buffers, cam, [light])


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest should force 8 cpu devices"
    return multichip.make_mesh(dp=2, sp=4)


class TestShardedRender:
    def test_matches_single_device(self, mesh8):
        buffers = tiny_scene()
        scene = graph.upload_scene(buffers, bucketize=False)
        cams = [camera(), camera(eye=(1.5, 1.0, -4.5))]
        consts = [consts_for(buffers, c) for c in cams]

        # single-device reference renders
        ref = [np.asarray(graph.render_forward(scene, c, W, H)["ldr"])
               for c in consts]

        batch = multichip.stack_frame_constants(consts)
        ldr, depth = multichip.render_forward_sharded(mesh8, scene, batch, W, H)
        ldr = np.asarray(ldr)
        assert ldr.shape == (2, H, W, 3)
        for i in range(2):
            np.testing.assert_allclose(ldr[i], ref[i], atol=2e-5)

    def test_band_seams_continuous(self, mesh8):
        # the two rows around each band boundary must not show artifacts:
        # compare against single-device render exactly (covered above), and
        # verify coverage crosses boundaries
        buffers = tiny_scene()
        scene = graph.upload_scene(buffers, bucketize=False)
        consts = [consts_for(buffers, camera())] * 2
        batch = multichip.stack_frame_constants(consts)
        ldr, depth = multichip.render_forward_sharded(mesh8, scene, batch, W, H)
        depth = np.asarray(depth[0])
        band_h = H // 4
        for b in range(1, 4):
            rows = depth[band_h * b - 1: band_h * b + 1]
            covered = rows < 1.0
            if covered.any():
                # object spans the seam somewhere: both rows see it
                assert covered[0].any() and covered[1].any()
