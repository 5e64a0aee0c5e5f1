import numpy as np

from vqengine_tpu.render import debug_draw
from vqengine_tpu.render.scene_buffers import assemble_scene
from vqengine_tpu.scene.material import Material
from vqengine_tpu.scene.mesh import build_builtin_meshes
from vqengine_tpu.scene.scenes import _add_object
from vqengine_tpu.scene.serialization import FSceneRepresentation


def _one_cube_rep():
    rep = FSceneRepresentation(name="t")
    _add_object(rep, "Cube", (0, 0, 0), (1, 1, 1), "")
    return rep


class TestVertexAxes:
    def test_three_items_with_unlit_colors(self):
        rep = _one_cube_rep()
        builtin = build_builtin_meshes()
        mats: list[Material] = [Material(name="__default__")]
        buffers, cams, lights = assemble_scene(
            rep, builtin, {}, draw_vertex_axes_of=0)
        # 1 cube + 3 TBN axis items survive into the flattened buffers
        assert len(np.unique(buffers.item_object)) == 4

    def test_geometry_spans_axis_length(self):
        from vqengine_tpu.scene.mesh import build_builtin_meshes
        from vqengine_tpu.render.scene_buffers import DrawItem
        from vqengine_tpu.utils import math3d as m3
        cube = build_builtin_meshes().get("Cube")
        item = DrawItem(name="c", mesh=cube, transform=m3.Transform(),
                        material_id=0, object_id=0)
        mats = []
        out = debug_draw.vertex_axes_items(item, mats, axis_length=0.5)
        assert len(out) == 3 and len(mats) == 3
        for it in out:
            lod = it.mesh.lods[0]
            # tubes extend beyond the unit cube by up to axis_length
            assert np.abs(lod.positions).max() <= 1.0 + 0.5 + 0.02 + 1e-5
            assert np.abs(lod.positions).max() > 1.0
            assert (m3 is not None) and lod.indices.max() < lod.positions.shape[0]
        # emissive-only materials
        assert all(m.emissive_intensity > 0 for m in mats)
