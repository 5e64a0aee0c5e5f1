"""Engine shell tests: state machine, events, input, picking, CLI run."""
from pathlib import Path

import numpy as np
import pytest

from vqengine_tpu.engine import events as ev
from vqengine_tpu.engine.cli import parse_command_line
from vqengine_tpu.engine.engine import EAppState, VQEngineTPU
from vqengine_tpu.engine.input import Input


def make_engine(scene="HelloCube", w=96, h=64, **flags):
    args = [f"-W={w}", f"-H={h}", f"-Scene={scene}"]
    e = VQEngineTPU(startup=parse_command_line(args))
    e.gfx.bAmbientOcclusion = False
    e.gfx.bAntiAliasing = False
    e.gfx.bDrawLightBounds = False  # keep picking tests deterministic
    e.gfx.Reflections = 0
    return e


class TestInput:
    def test_trigger_vs_held(self):
        i = Input()
        i.on_key_down("W")
        assert i.is_key_triggered("w") and i.is_key_down("w")
        i.post_update()
        assert not i.is_key_triggered("w") and i.is_key_down("w")
        i.on_key_up("w")
        assert i.is_key_released("w") and not i.is_key_down("w")

    def test_wasd(self):
        i = Input()
        i.on_key_down("w")
        i.on_key_down("d")
        v = i.wasd_vector()
        np.testing.assert_allclose(v, [1, 0, 1])


class TestEventQueue:
    def test_double_buffered(self):
        q = ev.BufferedEventQueue()
        q.push(ev.KeyDownEvent("a"))
        q.push(ev.KeyDownEvent("b"))
        drained = q.swap_and_drain()
        assert len(drained) == 2
        assert q.swap_and_drain() == []


class TestEngine:
    def test_state_machine_and_tick(self):
        e = make_engine()
        assert e.state == EAppState.INITIALIZING
        assert e.start_loading_scene("HelloCube")
        assert e.state == EAppState.SIMULATING
        out = e.tick()
        assert out.ldr.shape[0] == 64

    def test_resize_event(self):
        e = make_engine()
        e.start_loading_scene("HelloTriangle")
        e.events.push(ev.WindowResizeEvent(128, 96))
        e.tick()
        assert e.settings.Width == 128
        out = e.tick()
        assert np.asarray(out.ldr).shape[:2] == (96, 128)

    def test_camera_switch_key(self):
        e = make_engine(scene="Default")
        if not e.start_loading_scene("Default"):
            pytest.skip("reference Default scene unavailable")
        assert len(e.cameras) >= 2
        e.events.push(ev.KeyDownEvent("2"))
        e.handle_events()
        e.handle_engine_input(1 / 60)
        assert e.active_camera == 1

    def test_pick_via_click(self):
        e = make_engine()
        e.start_loading_scene("HelloCube")
        e.tick()
        # readback object id at the center: the cube (object 0)
        assert e.pick(48, 32) == 0
        assert e.pick(2, 2) == -1

    def test_automated_run_exit_code(self, tmp_path):
        from vqengine_tpu.__main__ import main
        rc = main(["-Test", "-TestFrames=2", "-W=96", "-H=64",
                   "-Scene=HelloTriangle", f"-OutputDir={tmp_path}"])
        assert rc == 0
        assert list(Path(tmp_path).glob("*.png"))


class TestDebugViews:
    def test_draw_mode_and_outline_and_magnifier(self):
        from vqengine_tpu.engine.events import (KeyDownEvent, KeyUpEvent,
                                                MouseClickEvent)
        e = make_engine()
        e.start_loading_scene("HelloCube")
        e.tick()
        lit = e._last_output.ldr.copy()

        # cycle draw mode via the 'v' binding -> depth view differs from lit
        e.events.push(KeyDownEvent("v"))
        e.tick()
        e.events.push(KeyUpEvent("v"))
        assert e.draw_mode == 1
        depth_view = e._last_output.ldr
        assert abs(depth_view - lit).mean() > 1e-3
        # depth view is grayscale
        assert abs(depth_view[..., 0] - depth_view[..., 1]).max() < 1e-5

        # click the cube -> selection outline appears in LIT mode
        e.draw_mode = 0
        e.events.push(MouseClickEvent(48, 32, 0))
        e.tick()
        assert e.selected_object == 0
        e.tick()
        outlined = e._last_output.ldr
        assert abs(outlined - lit).mean() > 1e-5

        # magnifier lens
        e.selected_object = -1
        e.magnifier_on = True
        e.tick()
        assert abs(e._last_output.ldr - lit).mean() > 1e-5


class TestAsyncLoading:
    def test_async_scene_load_keeps_ticking(self):
        """start_loading_scene_async returns immediately; ticks while the
        host load runs are safe no-ops, and a later tick finalizes the
        device upload (the reference's async load pipeline)."""
        import time as _t
        e = make_engine()
        assert e.start_loading_scene_async("HelloCube")
        assert e.state == EAppState.LOADING
        # ticking during the load must not crash, whether or not the host
        # work already finished
        deadline = _t.time() + 60
        out = None
        while e.state != EAppState.SIMULATING and _t.time() < deadline:
            out = e.tick()
        assert e.state == EAppState.SIMULATING
        out = e.tick()
        assert out is not None and np.isfinite(np.asarray(out.ldr)).all()

    def test_async_env_switch_nonblocking(self):
        """A SetEnvironmentMapEvent decodes on the worker pool; the next
        ticks keep rendering and eventually swap the environment."""
        import time as _t
        e = make_engine()
        assert e.start_loading_scene("HelloCube")
        e.events.push(ev.SetEnvironmentMapEvent("missing-preset"))
        e.tick()   # consumes the event, dispatches the async decode
        deadline = _t.time() + 60
        while e._env_future is not None and _t.time() < deadline:
            e.tick()
        # fell back to the procedural sky -> environment present
        assert e.environment is not None


class TestEditor:
    def test_material_live_edit(self):
        """editor_set_material hot-swaps the device materials tensor: the
        rendered color changes next frame (F4 material editor analog)."""
        e = make_engine(scene="HelloCube")
        assert e.start_loading_scene("HelloCube")
        out0 = e.tick()
        img0 = np.asarray(out0.ldr)
        names = e.scene_buffers.material_names
        changed = False
        for n in names:
            if e.editor_set_material(n, diffuse=(1.0, 0.0, 0.0),
                                     roughness=0.9):
                changed = True
        assert changed
        img1 = np.asarray(e.tick().ldr)
        assert np.abs(img1 - img0).max() > 0.05
        assert not e.editor_set_material("no-such-material", roughness=0.5)

    def test_light_and_object_edit(self):
        e = make_engine(scene="HelloCube")
        assert e.start_loading_scene("HelloCube")
        img0 = np.asarray(e.tick().ldr)
        assert e.editor_set_light(0, brightness=0.05)
        img1 = np.asarray(e.tick().ldr)
        assert img1.mean() < img0.mean()  # dimmer
        name = e.scene_buffers.items[0].name
        assert e.editor_set_object_transform(
            name, position=(50.0, 50.0, 50.0))
        img2 = np.asarray(e.tick().ldr)
        assert np.abs(img2 - img1).max() > 0.02  # object moved off-frame
        assert not e.editor_set_object_transform("no-such-item")


class TestRenderContexts:
    """Secondary render contexts — WindowRenderContext.h:44-75 (per-window
    swapchain + resolution) as named headless outputs."""

    def test_second_context_renders_own_resolution(self):
        e = make_engine()
        e.start_loading_scene("HelloCube")
        e.create_render_context("debug", 48, 48, hdr10=False)
        e.tick()
        out = e.context_output("debug")
        assert out is not None
        ldr = np.asarray(out.ldr)
        assert ldr.shape == (48, 48, 3)
        assert np.isfinite(ldr).all()
        # main output unaffected
        main = np.asarray(e._last_output.ldr)
        assert main.shape[0] == 64 and main.shape[1] == 96
        e.destroy_render_context("debug")
        e.tick()
        # context gone: output no longer updated
        assert e.context_output("debug") is None
