from pathlib import Path

from vqengine_tpu.engine.cli import parse_command_line
from vqengine_tpu.engine.settings import (
    FStartupParameters,
    load_engine_settings,
    load_environment_map_presets,
    load_scene_mapping,
)

REF_DATA = Path("/root/reference/Data")


class TestCli:
    def test_test_frames(self):
        p = parse_command_line(["-Test", "-TestFrames=250"])
        assert p.overrides["bAutomatedTestRun"] is True
        assert p.overrides["NumAutomatedTestFrames"] == 250

    def test_resolution_and_flags(self):
        p = parse_command_line(["-W=1920", "-Height=1080", "-VSync=false", "-AA", "-HDR=0"])
        assert p.overrides["Width"] == 1920
        assert p.overrides["Height"] == 1080
        assert p.overrides["bVsync"] is False
        assert p.overrides["bAntiAliasing"] is True
        assert p.overrides["bHDR"] is False

    def test_maxfps_auto(self):
        p = parse_command_line(["-MaxFPS=Auto"])
        assert p.overrides["MaxFrameRate"] == -1

    def test_scene(self):
        p = parse_command_line(["-Scene=Sponza"])
        assert p.overrides["SceneName"] == "Sponza"


class TestSettingsOverrideChain:
    def test_defaults(self):
        eng, gfx = load_engine_settings(None)
        assert eng.Width == 1600 and eng.Height == 900
        assert gfx.bAntiAliasing is True

    def test_ini_layer_reference_file(self):
        if not REF_DATA.is_dir():
            return
        eng, gfx = load_engine_settings(REF_DATA)
        # values straight out of the reference Data/EngineSettings.ini
        assert eng.Width == 1600 and eng.Height == 900
        assert gfx.bVsync is False
        assert gfx.EnvironmentMapResolution == 512
        assert gfx.bHDR is True

    def test_cli_overrides_ini(self):
        startup = FStartupParameters()
        startup.set("Width", 1280)
        startup.set("bHDR", False)
        eng, gfx = load_engine_settings(REF_DATA if REF_DATA.is_dir() else None, startup)
        assert eng.Width == 1280
        assert gfx.bHDR is False


class TestAuxIni:
    def test_scene_mapping(self):
        if not REF_DATA.is_dir():
            return
        mapping = load_scene_mapping(REF_DATA)
        assert mapping.get("Default") == 0
        assert mapping.get("Sponza") == 1
        assert mapping.get("Terrain") == 4

    def test_envmap_presets(self):
        if not REF_DATA.is_dir():
            return
        presets = load_environment_map_presets(REF_DATA)
        assert "GymEntrance" in presets
        assert presets["VeniceSunset"]["MaxCLL"] == "340"
