from pathlib import Path

import numpy as np
import pytest

from vqengine_tpu.scene.light import ELightType, EMobility
from vqengine_tpu.scene.serialization import parse_material_file, parse_scene_file

REF = Path("/root/reference/Data")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference data not mounted")


class TestSceneXml:
    def test_default_scene(self):
        rep = parse_scene_file(REF / "Levels/Default.xml")
        assert rep.env_map_preset == "GymEntrance"
        assert len(rep.cameras) == 2
        cam = rep.cameras[0]
        np.testing.assert_allclose(cam.position, [-0.935758, 5.132592, -30.1817], atol=1e-5)
        assert cam.fov_v_deg == 70.0
        assert cam.near_z == 0.1 and cam.far_z == 1000.0
        assert cam.drag == 9.5

        # 7 game objects in Default.xml (ground plane + cube + 2 cylinders +
        # boombox + sphere + platform)
        assert len(rep.objects) == 7
        ground = rep.objects[0]
        assert ground.model.builtin_mesh_name == "Cube"
        assert ground.model.material_name == "BlackHerringboneTiles01"
        np.testing.assert_allclose(ground.transform.scale, [100, 0.01, 100])

        boombox = [o for o in rep.objects if o.model.name == "BoomBox"][0]
        assert boombox.model.path.endswith("BoomBox.gltf")
        np.testing.assert_allclose(boombox.transform.scale, [800, 800, 800])

        # lights: 1 directional + 2 point + 2 spot
        assert len(rep.lights) == 5
        types = [l.type for l in rep.lights]
        assert types.count(ELightType.DIRECTIONAL) == 1
        assert types.count(ELightType.POINT) == 2
        assert types.count(ELightType.SPOT) == 2

        d = [l for l in rep.lights if l.type == ELightType.DIRECTIONAL][0]
        assert d.enabled and d.mobility == EMobility.STATIONARY
        assert d.brightness == pytest.approx(0.90)
        assert d.viewport_x == 256 and d.distance_from_origin == 120
        assert d.casts_shadows and d.depth_bias == pytest.approx(0.00045)

        s = [l for l in rep.lights if l.type == ELightType.SPOT][0]
        assert s.outer_cone_deg == 22 and s.inner_cone_deg == 20
        assert s.brightness == 1500

        disabled_points = [l for l in rep.lights if l.type == ELightType.POINT]
        assert all(not l.enabled for l in disabled_points)

    def test_all_reference_levels_parse(self):
        for xml in sorted((REF / "Levels").glob("*.xml")):
            rep = parse_scene_file(xml)
            assert rep.cameras, f"{xml.name}: no cameras"


class TestMaterialXml:
    def test_pbr_materials(self):
        mats = parse_material_file(REF / "Materials/PBRMaterials.xml")
        names = [m.name for m, _ in mats]
        assert "Marble_08" in names and "PaintedMetal02" in names
        painted = dict((m.name, t) for m, t in mats)["PaintedMetal02"]
        assert "diffuse" in painted and "metallic" in painted and "ao" in painted

    def test_all_material_files_parse(self):
        for xml in sorted((REF / "Materials").glob("*.xml")):
            mats = parse_material_file(xml)
            assert mats, f"{xml.name}: no materials"


class TestLightMatrices:
    def test_directional_viewproj_covers_origin(self):
        rep = parse_scene_file(REF / "Levels/Default.xml")
        d = [l for l in rep.lights if l.type == ELightType.DIRECTIONAL][0]
        vp = d.view_projection()
        clip = vp @ np.array([0, 0, 0, 1], dtype=np.float32)
        ndc = clip[:3] / clip[3]
        assert abs(ndc[0]) <= 1 and abs(ndc[1]) <= 1 and 0 <= ndc[2] <= 1

    def test_spot_viewproj_looks_at_cone(self):
        rep = parse_scene_file(REF / "Levels/Default.xml")
        s = [l for l in rep.lights if l.type == ELightType.SPOT][0]
        # a point slightly along the spot direction must be in the frustum center
        p = s.position + s.direction() * 5.0
        clip = s.view_projection() @ np.array([*p, 1], dtype=np.float32)
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-4)
