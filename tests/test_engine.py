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
