"""VQUI panel tests — the reference's Dear ImGui windows (VQUI.h:36-66:
F1 controls, F2 profiler, F3 graphics settings, F4 editor) rebuilt as
immediate-mode panels composited onto the frame, with edits writing
through to live engine state."""
import numpy as np

from vqengine_tpu.engine.cli import parse_command_line
from vqengine_tpu.engine.engine import VQEngineTPU
from vqengine_tpu.render import ui


def make_engine(scene="HelloCube", w=96, h=64):
    e = VQEngineTPU(startup=parse_command_line(
        [f"-W={w}", f"-H={h}", f"-Scene={scene}"]))
    e.gfx.bAmbientOcclusion = False
    e.gfx.bAntiAliasing = False
    e.gfx.bDrawLightBounds = False
    e.gfx.Reflections = 0
    e.start_loading_scene(scene)
    return e



def press(e, key):
    """Key tap: down + tick + up (is_key_triggered requires a fresh press,
    so repeated taps need the release in between like real input)."""
    e.input.on_key_down(key)
    e.tick()
    e.input.on_key_up(key)

class TestWidgets:
    def test_cursor_skips_labels(self):
        p = ui.Panel("t", [ui.Widget("a"),
                           ui.Widget("b", "check", lambda: True,
                                     lambda v: None),
                           ui.Widget("c"),
                           ui.Widget("d", "check", lambda: False,
                                     lambda v: None)])
        p.move_cursor(1)
        assert p.cursor == 1
        p.move_cursor(1)
        assert p.cursor == 3
        p.move_cursor(1)
        assert p.cursor == 1            # wraps, never lands on a label

    def test_adjust_kinds(self):
        state = {"b": False, "c": 0, "s": 0.5}
        chk = ui.Widget("b", "check", lambda: state["b"],
                        lambda v: state.update(b=v))
        cho = ui.Widget("c", "choice", lambda: state["c"],
                        lambda v: state.update(c=v), choices=["x", "y", "z"])
        sld = ui.Widget("s", "slider", lambda: state["s"],
                        lambda v: state.update(s=v), step=0.3, lo=0.0,
                        hi=1.0)
        chk.adjust(1)
        assert state["b"] is True
        cho.adjust(-1)
        assert state["c"] == 2
        sld.adjust(1)
        sld.adjust(1)
        assert abs(state["s"] - 1.0) < 1e-6    # clamped at hi
        assert cho.value_str() == "< z >"
        assert chk.value_str() == "[x]"

    def test_draw_panel_writes_pixels(self):
        img = np.zeros((64, 128, 3), np.float32)
        p = ui.Panel("TEST", [ui.Widget("row one"),
                              ui.Widget("toggle", "check", lambda: True,
                                        lambda v: None)])
        out = ui.draw_panel(img, p)
        assert out.shape == img.shape
        assert (out != img).any()
        # panel background covers its rect
        assert out[20, 30].sum() > 0


class TestEnginePanels:
    def test_f3_settings_toggle_writes_through(self):
        e = make_engine()
        e.tick()
        base = np.array(e._last_output.ldr, copy=True)
        # open the settings panel
        press(e, "f3")
        assert e.ui_panel == 3
        with_panel = np.asarray(e._last_output.ldr)
        assert (np.abs(with_panel - base) > 0.01).any(), "panel invisible"
        # first interactive row is the MSAA checkbox; toggle it on
        assert e.gfx.bAntiAliasing is False
        press(e, "enter")
        assert e.gfx.bAntiAliasing is True, "enter did not toggle MSAA"
        # navigate down to SSAO row and toggle
        press(e, "down")
        press(e, "enter")
        assert e.gfx.bAmbientOcclusion is True
        # close: frame returns to (re-rendered) panel-free output
        press(e, "f3")
        assert e.ui_panel == 0

    def test_f2_profiler_and_f1_controls_render(self):
        e = make_engine()
        e.tick()
        for key, pid in (("f2", 2), ("f1", 1)):
            press(e, key)
            assert e.ui_panel == pid
            press(e, key)
            assert e.ui_panel == 0

    def test_f4_editor_adjusts_selected_material(self):
        e = make_engine()
        e.tick()
        # select the cube (object 0) as if picked
        e.selected_object = 0
        mat = e.editor_material_of_object(0)
        assert mat is not None
        r0 = e.editor_get_material(mat, "roughness")
        press(e, "f4")
        assert e.ui_panel == 4
        # focused row is the roughness slider; nudge it up
        press(e, "right")
        r1 = e.editor_get_material(mat, "roughness")
        assert abs(r1 - r0) > 1e-6, "editor slider did not write through"

    def test_shadow_filter_choice_invalidates_cached_maps(self):
        e = make_engine()
        e.tick()
        e.gfx.ShadowFilter = "pcf"
        e.tick()
        assert e._shadow_filter_cached in (None, "pcf")
