"""VQEngineTPU — the app shell, counterpart of the reference VQEngine
orchestrator (VQEngine.h:95-415): app state machine INITIALIZING -> LOADING
-> SIMULATING -> UNLOADING -> EXITING (VQEngine.h:72-81), scene loading
dispatch (VQEngine_Update.cpp:483-560), the -Test/-TestFrames automated run
contract (Main.cpp:65-86, VQEngine_Main.cpp:60-77), and the frame loop
(VQEngine_Simulation.cpp:88-105).

Differences by design: headless (framebuffers dump to PNG instead of a
swapchain present), single host thread driving an async device (JAX's
dispatch pipeline replaces the update/render thread pipelining).
"""
from __future__ import annotations

import enum
import time
from pathlib import Path

import numpy as np

from ..render.renderer import VQRendererTPU
from ..render.scene_buffers import assemble_scene
from ..scene.mesh import build_builtin_meshes
from ..scene.serialization import parse_material_file, parse_scene_file
from ..utils import log
from ..utils.image_io import write_png
from .cli import parse_command_line
from .settings import (FStartupParameters, load_engine_settings,
                       load_environment_map_presets,
                       load_hdr_display_profiles, load_scene_mapping)


class EAppState(enum.Enum):
    """Reference VQEngine.h:72-81."""
    INITIALIZING = 0
    LOADING = 1
    SIMULATING = 2
    UNLOADING = 3
    EXITING = 4


_PKG_DATA = Path(__file__).resolve().parent.parent.parent / "Data"
DEFAULT_DATA_DIRS = ("Data", str(_PKG_DATA), "/root/reference/Data")


def find_data_dirs() -> list[Path]:
    """All data roots, in priority order (own Data first, then the
    reference's for its levels/materials)."""
    seen, out = set(), []
    for d in DEFAULT_DATA_DIRS:
        p = Path(d).resolve()
        if p in seen:
            continue
        if (p / "Levels").is_dir() or (p / "EngineSettings.ini").is_file():
            seen.add(p)
            out.append(p)
    return out


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache — the counterpart of the reference's
    binary shader/PSO cache directories (Renderer.h:508-510,
    ShaderCompileUtils.cpp:205 include-aware dirty checking; here XLA does
    the dirty tracking). First-run compiles are slow; subsequent runs hit
    the cache."""
    import jax
    try:
        cache_dir = Path.home() / ".cache" / "vqengine_tpu" / "xla"
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


class VQEngineTPU:
    def __init__(self, argv: list[str] | None = None,
                 startup: FStartupParameters | None = None):
        _enable_compilation_cache()
        self.state = EAppState.INITIALIZING
        startup = startup or parse_command_line(argv or [])
        self.data_dirs = find_data_dirs()
        self.data_dir = self.data_dirs[0] if self.data_dirs else None
        self.settings, self.gfx = load_engine_settings(self.data_dir, startup)
        log.initialize(console=self.settings.bLogConsole,
                       file=self.settings.bLogFile,
                       file_path=self.settings.LogFilePath)
        log.info(f"VQEngineTPU initializing (data dirs: {self.data_dirs})")

        self.scene_mapping = {}
        self.env_presets = {}
        self.hdr_profiles = {}
        for d in reversed(self.data_dirs):  # earlier dirs win
            self.scene_mapping.update(load_scene_mapping(d))
            self.env_presets.update(load_environment_map_presets(d))
            self.hdr_profiles.update(load_hdr_display_profiles(d))
        # environment MaxCLL (nits) of the active env preset; with the
        # display profile it sets the HDR10 encode brightness the way the
        # reference's SetHDRMetaData does (SwapChain.h:76-99)
        self._env_max_cll = 0.0
        self.builtin_meshes = build_builtin_meshes()
        from ..scene.texture_manager import TextureManager
        self.texture_manager = TextureManager()
        self.texture_arrays = None
        self.material_lib = self._load_material_lib()
        self.renderer = VQRendererTPU(self.gfx)

        self.scene_buffers = None
        self.cameras = []
        self.lights = []
        self.active_camera = 0
        self.scene_name = ""
        self.num_ticks = 0
        self.scene_update_hook = None  # fn(engine, dt) for animated scenes
        self.environment = None        # EnvironmentMaps after scene load
        self._prev_world = None        # motion-vector history
        self._prev_vp = None
        self._dynamic_items = ()       # sticky moved-item set (motion fast path)
        self._last_output = None       # picking readback source
        self._ssr_history = None       # SSR temporal accumulation
        self._static_shadow_maps = None  # cached STATIC-light shadow maps
        # UI/debug state (the VQUI F3 draw-mode dropdown, MagnifierPass
        # params and the editor's selected-object outline)
        self.draw_mode = 0             # visualization.DRAW_MODE_*
        self.magnifier_on = False
        self.magnifier_center = (0.5, 0.5)
        self.selected_object = -1
        # VQUI windows (VQUI.h:36-66): 0 closed, 1..4 = F1..F4 panel
        self.ui_panel = 0
        self._ui_cursor = 0
        self._shadow_filter_cached = None  # filter the cached maps used

        from .events import BufferedEventQueue
        from .input import Input
        self.input = Input()
        self.events = BufferedEventQueue()
        self._last_stats_log = time.perf_counter()
        self._frame_times: list[float] = []
        # async loading pipeline (the reference's mWorkers_ModelLoading /
        # background env-map queues): host-side parse/decode runs on this
        # pool while frames keep flowing; device upload + IBL prefilter
        # finalize on the main thread when the future completes
        import concurrent.futures as _futures
        self._async_pool = _futures.ThreadPoolExecutor(max_workers=2)
        self._env_future = None
        self._scene_future = None

    # ------------------------------------------------------------------
    def _load_material_lib(self) -> dict:
        lib = {}
        self.material_tex_paths = {}
        for d in reversed(self.data_dirs):  # earlier dirs win
            mat_dir = d / "Materials"
            if not mat_dir.is_dir():
                continue
            for xml in sorted(mat_dir.glob("*.xml")):
                try:
                    for mat, tex_paths in parse_material_file(xml):
                        lib[mat.name] = mat
                        self.material_tex_paths[mat.name] = tex_paths
                except Exception as e:  # noqa: BLE001 — tolerate bad files like the reference
                    log.warning(f"failed to parse {xml.name}: {e}")
        # procedural-texture materials (reference EProceduralTextures +
        # the StressTest's Checkerboard materials)
        from ..scene.material import Material
        from ..scene.texture_manager import (checkerboard,
                                             checkerboard_grayscale)
        cb = Material(name="Checkerboard")
        cb.textures["diffuse"] = self.texture_manager.create_from_array(
            "proc:checkerboard", checkerboard())
        lib["Checkerboard"] = cb
        cbg = Material(name="Checkerboard_Grayscale")
        cbg.textures["diffuse"] = self.texture_manager.create_from_array(
            "proc:checkerboard_gray", checkerboard_grayscale())
        lib["Checkerboard_Grayscale"] = cbg
        log.info(f"loaded {len(lib)} materials")
        return lib

    def _resolve_material_textures(self, used_names: set[str]) -> None:
        """Queue async texture loads for the used materials' texture slots
        (the AssetLoader::QueueTextureLoad + material-texture assignment
        join, AssetLoader.cpp:215,314). Missing files drop the slot."""
        tm = self.texture_manager
        bases = [d.parent for d in self.data_dirs]
        queued = []
        for name in used_names:
            mat = self.material_lib.get(name)
            paths = self.material_tex_paths.get(name, {})
            if mat is None or not paths:
                continue
            for slot, path in paths.items():
                tid = tm.create_from_file(path, search_dirs=bases)
                mat.textures[slot] = tid
                queued.append((mat, slot, tid))
        tm.wait_all()
        from ..scene.texture_manager import ETextureState
        dropped = 0
        for mat, slot, tid in queued:
            if tm.state(tid) != ETextureState.READY:
                mat.textures.pop(slot, None)
                dropped += 1
        if queued:
            log.info(f"textures: {len(queued) - dropped} loaded, "
                     f"{dropped} missing (slots dropped)")
        # fuse normal/roughness/metallic maps into one sampled fetch
        n_combined = tm.combine_aux_maps(
            m for m in (self.material_lib.get(n) for n in used_names)
            if m is not None)
        if n_combined:
            log.info(f"combined aux maps for {n_combined} materials")
        # pair diffuse+aux quads into single 32 B gather rows (one dense
        # fetch per pixel instead of two; ops/texture pair_flat)
        n_paired = tm.combine_pair_quads(
            m for m in (self.material_lib.get(n) for n in used_names)
            if m is not None)
        if n_paired:
            log.info(f"paired diffuse+aux quads for {n_paired} materials")

    # ------------------------------------------------------------------
    def resolve_scene_file(self, name_or_index) -> Path | None:
        if isinstance(name_or_index, int):
            inv = {v: k for k, v in self.scene_mapping.items()}
            name = inv.get(name_or_index)
            if name is None:
                return None
        else:
            name = name_or_index
        for d in self.data_dirs:
            p = d / "Levels" / f"{name}.xml"
            if p.is_file():
                return p
        return None

    def start_loading_scene(self, name_or_index) -> bool:
        """Reference VQEngine::StartLoadingScene (VQEngine_Main.cpp:680) +
        Load_SceneData_Dispatch (VQEngine_Update.cpp:483). Synchronous:
        host parse/assemble + device upload in one call."""
        self.state = EAppState.LOADING
        host = self._load_scene_host(name_or_index)
        if host is None:
            return False
        self._finalize_scene_load(host)
        return True

    def start_loading_scene_async(self, name_or_index) -> bool:
        """Dispatch the host-side load (XML parse, procedural generation,
        glTF import, texture decode, HDRI read — all numpy/IO) to the
        worker pool; frames keep flowing until poll_scene_loading()
        finalizes the device upload (the reference's mWorkers_ModelLoading
        pipeline + OnLoadComplete, SceneLoading.cpp:100/451)."""
        self.state = EAppState.LOADING
        self._scene_future = self._async_pool.submit(
            self._load_scene_host, name_or_index)
        return True

    def poll_scene_loading(self) -> bool:
        """Finalize a pending async scene load if its host work is done.
        Returns True when a new scene just became active."""
        if self._scene_future is None or not self._scene_future.done():
            return False
        host = self._scene_future.result()
        self._scene_future = None
        if host is None:
            log.error("async scene load failed")
            return False
        self._finalize_scene_load(host)
        return True

    def _load_scene_host(self, name_or_index):
        """Host-side (thread-safe, numpy/IO only) part of a scene load."""
        path = self.resolve_scene_file(name_or_index)
        if path is None:
            log.error(f"scene '{name_or_index}' not found")
            return None
        t0 = time.perf_counter()
        rep = parse_scene_file(path)
        # typed-scene augmentation (the Scene subclass behaviors,
        # Source/Scenes/*.cpp): procedural objects + update hooks
        from ..scene.scenes import augment_scene
        hook = augment_scene(
            rep.name, rep, self.material_lib, self.builtin_meshes,
            data_dirs=self.data_dirs)
        used_materials = {o.model.material_name for o in rep.objects
                          if o.model.material_name}
        self._resolve_material_textures(used_materials)
        buffers, cameras, lights = assemble_scene(
            rep, self.builtin_meshes, self.material_lib,
            gltf_loader=self._gltf_loader,
            draw_light_gizmos=self.gfx.bDrawLightBounds,
            draw_bounding_boxes=self.gfx.bDrawBoundingBoxes)
        any_textured = any(
            (m.pack()[15] > 0 or m.combined_aux >= 0) for m in
            [self.material_lib.get(n) for n in used_materials]
            if m is not None) or any(
            it.material_id and (buffers.materials[it.material_id][15] > 0
                                or buffers.materials[it.material_id][29] >= 0)
            for it in buffers.items)
        equirect = self._decode_environment(rep)
        return dict(rep=rep, hook=hook, buffers=buffers, cameras=cameras,
                    lights=lights, any_textured=any_textured,
                    equirect=equirect, t0=t0)

    def _finalize_scene_load(self, host) -> None:
        """Device-side completion (main thread): uploads + IBL prefilter
        (the reference's OnLoadComplete heap uploads)."""
        rep, buffers = host["rep"], host["buffers"]
        self.scene_name = rep.name
        self.scene_update_hook = host["hook"]
        self.scene_buffers = buffers
        self.cameras = host["cameras"]
        self.lights = host["lights"]
        self.active_camera = 0
        aspect = self.settings.Width / max(1, self.settings.Height)
        for c in self.cameras:
            c.aspect = aspect
        self.renderer.load_scene(buffers)
        self._prev_world = None
        self._prev_vp = None
        self._dynamic_items = ()
        self._last_output = None
        self._ssr_history = None
        self._static_shadow_maps = None
        # quad-packed RGBA8 is the production sampling layout (one row
        # gather per bilinear tap); see ops/texture.py PackedTextures
        self.texture_arrays = (self.texture_manager.build_device_arrays_packed()
                               if host["any_textured"] else None)
        self.environment = self._build_environment_maps(host["equirect"])
        log.info(f"scene '{rep.name}' loaded in "
                 f"{time.perf_counter()-host['t0']:.2f}s "
                 f"({len(buffers.items)} items, {len(self.lights)} lights, "
                 f"env={'yes' if self.environment is not None else 'no'})")
        self.state = EAppState.SIMULATING

    def hdr_display_brightness(self, default: float = 200.0) -> float:
        """ST2084 reference brightness (nits) = display profile
        MaxBrightness clamped by the environment's MaxCLL (see
        settings.hdr_reference_brightness)."""
        from .settings import hdr_reference_brightness
        return hdr_reference_brightness(
            self.hdr_profiles, self.settings.HDRProfile,
            self._env_max_cll, default)

    def _decode_environment(self, rep):
        """Host-side env-map decode: preset -> HDRI file -> equirect array
        (missing files fall back to a procedural sky). None = scene wants
        no environment."""
        from ..ops.ibl import procedural_sky_equirect
        from ..utils.image_io import read_hdr

        if not rep.env_map_preset and not rep.env_map_path:
            return None
        equirect = None
        path = rep.env_map_path
        preset = {}
        if rep.env_map_preset and rep.env_map_preset in self.env_presets:
            preset = self.env_presets[rep.env_map_preset]
            path = preset.get("Path", "")
        self._env_max_cll = float(preset.get("MaxCLL", 0.0))
        if path:
            for base in [d.parent for d in self.data_dirs] + [Path(".")]:
                p = Path(base) / path
                if p.is_file():
                    try:
                        equirect = read_hdr(p)
                        log.info(f"loaded HDRI {p} {equirect.shape}")
                        break
                    except Exception as e:  # noqa: BLE001
                        log.warning(f"HDRI load failed for {p}: {e}")
        if equirect is None:
            # procedural presets (Data/EnvironmentMaps.ini SunPitch/SunYaw)
            # parameterize the sky instead of naming a file
            kw = {}
            if "SunPitch" in preset or "SunYaw" in preset:
                import math
                pitch = math.radians(float(preset.get("SunPitch", 45.0)))
                yaw = math.radians(float(preset.get("SunYaw", 30.0)))
                kw["sun_dir"] = (math.cos(pitch) * math.sin(yaw),
                                 math.sin(pitch),
                                 math.cos(pitch) * math.cos(yaw))
                if "Turbidity" in preset:
                    # hazier sky: dimmer disc, brighter horizon
                    t = float(preset["Turbidity"])
                    kw["sun_intensity"] = 50.0 / max(t / 2.5, 1.0)
            else:
                log.warning(f"environment '{rep.env_map_preset or path}' "
                            f"not found; using procedural sky")
            equirect = procedural_sky_equirect(512, 256, **kw)
        # cap source resolution (8K HDRIs are overkill for 128px cubemaps)
        max_w = 2048
        if equirect.shape[1] > max_w:
            step = equirect.shape[1] // max_w
            equirect = equirect[::step, ::step]
        return equirect

    def _build_environment_maps(self, equirect, diffuse_size: int = 64,
                                specular_base: int = 128):
        """Device-side IBL prefiltering (the reference's background-queue
        PreFilterEnvironmentMap, EnvironmentMapRendering.cpp:139-486)."""
        if equirect is None:
            return None
        from ..render.graph import build_environment
        t0 = time.perf_counter()
        env = build_environment(equirect, diffuse_size=diffuse_size,
                                specular_base=specular_base)
        log.info(f"IBL prefilter done in {time.perf_counter()-t0:.2f}s")
        return env

    def _load_environment(self, rep, diffuse_size: int = 64,
                          specular_base: int = 128):
        """Synchronous decode + prefilter (kept for tests/direct use)."""
        return self._build_environment_maps(
            self._decode_environment(rep), diffuse_size=diffuse_size,
            specular_base=specular_base)

    def _gltf_loader(self, path: str):
        from ..scene.gltf import load_gltf_meshes
        bases = [d.parent for d in self.data_dirs] + [Path(".")]
        for base in bases:
            p = Path(base) / path
            if p.is_file():
                try:
                    return load_gltf_meshes(p)
                except Exception as e:  # noqa: BLE001
                    log.warning(f"glTF load failed for {p}: {e}")
        return None

    # ------------------------------------------------------------------
    def render_frame(self, readback: bool = True):
        cam = self.cameras[self.active_camera]
        yaw01 = getattr(self.scene_update_hook, "hdri_yaw", 0.0)
        consts = self.renderer.build_frame_constants(
            self.scene_buffers, cam, self.lights,
            hdri_yaw=yaw01 * 2.0 * np.pi,
            prev_world=self._prev_world, prev_view_proj=self._prev_vp)
        # STATIC/STATIONARY light mobility: cache shadow maps across frames
        # when nothing animates (Light.h mobility semantics)
        from ..scene.light import EMobility
        casters = [l for l in self.lights if l.enabled and l.casts_shadows]
        static_ok = (self.scene_update_hook is None and casters and
                     all(l.mobility != EMobility.DYNAMIC for l in casters))
        if self._shadow_filter_cached not in (None, self.gfx.ShadowFilter):
            self._static_shadow_maps = None   # filter changed (F3 toggle)
        if static_ok and self._static_shadow_maps is None:
            t0 = time.perf_counter()
            self._static_shadow_maps = self.renderer.precompute_shadow_maps(
                consts, filter_mode=self.gfx.ShadowFilter)
            self._shadow_filter_cached = self.gfx.ShadowFilter
            log.info(f"static shadow maps cached in "
                     f"{time.perf_counter()-t0:.2f}s ({len(casters)} casters)")
        import numpy as _np
        world_np = _np.asarray(consts.world)
        # sticky moved-item set: once an item animates it stays in the
        # set (a stable jit key — per-frame churn would recompile); the
        # motion fast path reprojects static items by camera alone and
        # lane-selects the few dynamic ones (graph.motion_vectors)
        if (self._prev_world is not None
                and self._prev_world.shape == world_np.shape):
            moved = _np.flatnonzero(
                _np.abs(world_np - self._prev_world).max(axis=(1, 2)) > 1e-6)
            if moved.size:
                self._dynamic_items = tuple(sorted(
                    set(self._dynamic_items) | {int(i) for i in moved}))
        self._prev_world = world_np
        self._prev_vp = _np.asarray(consts.view_proj)
        self._last_output = self.renderer.render(
            consts, self.settings.Width, self.settings.Height,
            hdr10=False, readback=readback, env=self.environment,
            enable_ssao=self.gfx.bAmbientOcclusion,
            enable_motion=self.gfx.bMotionVectors,
            textures=self.texture_arrays,
            msaa=self.gfx.bAntiAliasing,
            enable_ssr=bool(self.gfx.Reflections),
            ssr_history=self._ssr_history,
            render_scale=self.gfx.RenderScale,
            shadow_maps=self._static_shadow_maps,
            shadow_filter=self.gfx.ShadowFilter,
            ssao_quality=self.gfx.SSAOQuality,
            dynamic_item_ids=self._dynamic_items)
        self._ssr_history = self._last_output.ssr_history
        self._apply_debug_views()
        return self._last_output

    # ------------------------------------------------------------------
    # secondary render contexts (WindowRenderContext.h:44-75: per-window
    # swapchain + present queue + display resolution; Renderer.cpp:735
    # InitializeRenderContext). Headless counterpart: named outputs with
    # their own resolution, camera, and display curve — each context gets
    # its own jit-specialized graph (its "swapchain format") and renders
    # after the main view each tick; `run` dumps them alongside the main
    # frames (the debug-window present).
    # ------------------------------------------------------------------

    def create_render_context(self, name: str, width: int, height: int,
                              camera_index: int = 0,
                              hdr10: bool = False) -> None:
        if not hasattr(self, "_render_contexts"):
            self._render_contexts = {}
        self._render_contexts[name] = {
            "width": int(width), "height": int(height),
            "camera": int(camera_index), "hdr10": bool(hdr10),
            "last": None}

    def destroy_render_context(self, name: str) -> None:
        getattr(self, "_render_contexts", {}).pop(name, None)

    def context_output(self, name: str):
        ctx = getattr(self, "_render_contexts", {}).get(name)
        return None if ctx is None else ctx["last"]

    def _render_extra_contexts(self) -> None:
        ctxs = getattr(self, "_render_contexts", None)
        if not ctxs or self.scene_buffers is None:
            return
        from ..scene.camera import Camera
        for name, ctx in ctxs.items():
            cam_i = min(ctx["camera"], len(self.cameras) - 1)
            src = self.cameras[cam_i]
            # per-context aspect: same pose/lens, this window's projection
            cam = Camera(src.params, aspect=ctx["width"] / ctx["height"])
            cam.position = src.position.copy()
            cam.pitch, cam.yaw = src.pitch, src.yaw
            consts = self.renderer.build_frame_constants(
                self.scene_buffers, cam, self.lights)
            ctx["last"] = self.renderer.render(
                consts, ctx["width"], ctx["height"], hdr10=ctx["hdr10"],
                env=self.environment, textures=self.texture_arrays,
                enable_ssao=False, msaa=False, enable_ssr=False,
                shadow_maps=self._static_shadow_maps)

    def _build_ui_panel(self):
        """Construct the open VQUI window against live engine state,
        restoring the persistent cursor (panels rebuild per frame like
        immediate-mode UI; the cursor is the only retained state)."""
        from ..render import ui
        builders = {1: ui.build_controls_panel,
                    2: lambda: ui.build_profiler_panel(self),
                    3: lambda: ui.build_settings_panel(self),
                    4: lambda: ui.build_editor_panel(self)}
        b = builders.get(self.ui_panel)
        if b is None:
            return None
        panel = b()
        panel.cursor = self._ui_cursor
        if panel.cursor not in panel.interactive_rows():
            rows = panel.interactive_rows()
            panel.cursor = rows[0] if rows else 0
        return panel

    def _apply_debug_views(self) -> None:
        """Engine-side debug view chain on the finished frame: draw-mode
        visualization (Visualization.hlsl CS), selected-object outline
        (OutlinePass), the magnifier lens (MagnifierPass) and the VQUI
        panel composite (UIPass)."""
        out = self._last_output
        if out is None or out.ldr is None:
            return
        if not (self.draw_mode or self.magnifier_on or self.ui_panel
                or self.selected_object >= 0):
            return
        import dataclasses

        import jax.numpy as jnp
        import numpy as _np

        from ..ops import visualization as viz
        ldr = jnp.asarray(out.ldr)
        if self.draw_mode:
            ldr = viz.visualize(self.draw_mode, ldr, depth=out.depth,
                                ao=out.ao, motion=out.motion,
                                object_id=out.object_id)
        if self.selected_object >= 0 and out.object_id is not None:
            ldr = viz.outline(ldr, jnp.asarray(out.object_id),
                              self.selected_object)
        if self.magnifier_on:
            ldr = viz.magnifier(ldr, self.magnifier_center)
        ldr_np = _np.asarray(ldr)
        if self.ui_panel:
            from ..render import ui
            panel = self._build_ui_panel()
            if panel is not None:
                ldr_np = ui.draw_panel(ldr_np, panel)
        self._last_output = dataclasses.replace(out, ldr=ldr_np)

    def pick(self, x: int, y: int) -> int:
        """Mouse-picking readback (the reference's ObjectID pass + async
        COPY-queue readback, ObjectIDPass.cpp:398-428 /
        VQEngine_Update.cpp:242-278): returns the object id under the
        pixel, or -1."""
        if self._last_output is None or self._last_output.object_id is None:
            return -1
        import numpy as _np
        oid = _np.asarray(self._last_output.object_id)
        if 0 <= y < oid.shape[0] and 0 <= x < oid.shape[1]:
            return int(oid[y, x])
        return -1

    # ------------------------------------------------------------------
    # events + input (VQEngine_EventHandlers.cpp / HandleEngineInput,
    # VQEngine_Update.cpp:459-469)
    # ------------------------------------------------------------------
    def handle_events(self) -> None:
        from . import events as ev
        for e in self.events.swap_and_drain():
            if isinstance(e, ev.WindowResizeEvent):
                self.settings.Width = e.width
                self.settings.Height = e.height
                aspect = e.width / max(1, e.height)
                for c in self.cameras:
                    c.aspect = aspect
                log.info(f"resized to {e.width}x{e.height}")
            elif isinstance(e, ev.SetVSyncEvent):
                self.gfx.bVsync = e.enabled
            elif isinstance(e, ev.SetHDREvent):
                self.gfx.bHDR = e.enabled
            elif isinstance(e, ev.SetEnvironmentMapEvent):
                # async: the HDRI decode runs on the worker pool and the
                # prefilter finalizes in a later tick — frames keep
                # flowing through an env switch (the reference's
                # background env queues, Renderer.h:342-355)
                from ..scene.serialization import FSceneRepresentation
                rep = FSceneRepresentation(env_map_preset=e.preset)
                self._env_future = self._async_pool.submit(
                    self._decode_environment, rep)
            elif isinstance(e, ev.KeyDownEvent):
                self.input.on_key_down(e.key)
            elif isinstance(e, ev.KeyUpEvent):
                self.input.on_key_up(e.key)
            elif isinstance(e, ev.MouseMoveEvent):
                self.input.on_mouse_move(e.dx, e.dy)
            elif isinstance(e, ev.MouseClickEvent):
                self.input.on_mouse_click(e.x, e.y, e.button)

    def handle_engine_input(self, dt: float) -> None:
        """The reference's engine-level key bindings
        (HandleEngineInput + UI toggles)."""
        inp = self.input
        # camera switch by number keys (Scene::Update)
        for i in range(min(9, len(self.cameras))):
            if inp.is_key_triggered(str(i + 1)):
                self.active_camera = i
        # environment-map cycling (PageUp/PageDown, VQEngine_Main.cpp:669)
        presets = list(self.env_presets)
        if presets and (inp.is_key_triggered("pageup") or inp.is_key_triggered("pagedown")):
            cur = getattr(self, "_env_index", 0)
            step = 1 if inp.is_key_triggered("pageup") else -1
            self._env_index = (cur + step) % len(presets)
            from .events import SetEnvironmentMapEvent
            self.events.push(SetEnvironmentMapEvent(presets[self._env_index]))
        # first-person camera drive
        cam = self.cameras[self.active_camera] if self.cameras else None
        if cam is not None:
            move = inp.wasd_vector()
            if move.any() or inp.mouse_dx or inp.mouse_dy:
                cam.update_first_person(
                    dt, move * 0.01,
                    d_yaw_deg=inp.mouse_dx * cam.params.angular_speed * 57.3 * 0.01,
                    d_pitch_deg=inp.mouse_dy * cam.params.angular_speed * 57.3 * 0.01)
        # mouse picking on click (VQEngine_Update.cpp:242-278); the picked
        # object drives the editor outline (OutlinePass)
        for (x, y, _b) in inp.clicks():
            picked = self.pick(x, y)
            self.selected_object = picked
            log.info(f"picked object {picked} at ({x},{y})")
        # draw-mode cycle + magnifier toggle (VQUI F3 dropdown /
        # MagnifierPass; bound to plain keys in the windowless build)
        if inp.is_key_triggered("v"):
            self.draw_mode = (self.draw_mode + 1) % 9
            log.info(f"draw mode {self.draw_mode}")
        if inp.is_key_triggered("m"):
            self.magnifier_on = not self.magnifier_on
        # VQUI windows (VQUI.h:36-66): F1 controls, F2 profiler,
        # F3 graphics settings, F4 editor; arrows navigate, left/right/
        # enter change the focused row — edits write through to live
        # engine state (the ImGui widget -> engine write path)
        for i in range(1, 5):
            if inp.is_key_triggered(f"f{i}"):
                self.ui_panel = 0 if self.ui_panel == i else i
                self._ui_cursor = 0
        if self.ui_panel:
            panel = self._build_ui_panel()
            if panel is not None:
                if inp.is_key_triggered("up"):
                    panel.move_cursor(-1)
                if inp.is_key_triggered("down"):
                    panel.move_cursor(1)
                direction = 0
                if inp.is_key_triggered("left"):
                    direction = -1
                if inp.is_key_triggered("right") or inp.is_key_triggered("enter"):
                    direction = 1
                if direction:
                    before = (self.gfx.RenderScale, self.gfx.Reflections,
                              self.gfx.bMotionVectors)
                    panel.adjust(direction)
                    if before != (self.gfx.RenderScale,
                                  self.gfx.Reflections,
                                  self.gfx.bMotionVectors):
                        self._ssr_history = None  # shape/config changed
                self._ui_cursor = panel.cursor

    # ------------------------------------------------------------------
    # editor mutation API (the VQUI F4 editor's material/light/object
    # panels, VQUI.h:36-66 — headless surface: call these, next frame
    # renders the change)
    # ------------------------------------------------------------------

    _MATERIAL_COLS = {
        "diffuse": (0, 3), "alpha": (3, 1), "emissive_color": (4, 3),
        "emissive_intensity": (7, 1), "uv_scale": (8, 2),
        "uv_offset": (10, 2), "roughness": (12, 1), "metalness": (13, 1),
        "displacement": (14, 1), "normal_map_mip_bias": (16, 1),
    }

    def editor_material_of_object(self, object_id: int) -> str | None:
        """Material name of the item with the given object id (the F4
        editor's selection -> material panel binding)."""
        bufs = self.scene_buffers
        if bufs is None or object_id < 0:
            return None
        import numpy as _np
        hits = _np.nonzero(_np.asarray(bufs.item_object) == object_id)[0]
        if hits.size == 0:
            return None
        mid = int(bufs.item_material[hits[0]])
        if 0 <= mid < len(bufs.material_names):
            return bufs.material_names[mid]
        return None

    def editor_get_material(self, name: str, key: str):
        """Read a packed material parameter by name (the editor panel's
        display path; inverse of editor_set_material)."""
        bufs = self.scene_buffers
        if bufs is None or name not in bufs.material_names:
            return None
        span = self._MATERIAL_COLS.get(key)
        if span is None:
            return None
        row = bufs.material_names.index(name)
        off, width = span
        import numpy as _np
        vals = _np.asarray(bufs.materials)[row, off:off + width]
        return vals if width > 1 else float(vals[0])

    def editor_set_material(self, name: str, **params) -> bool:
        """Mutate packed material parameters by name and hot-swap the
        device materials tensor (a [M,32] upload — the editor's
        live-tweak path). Returns False for unknown material/param."""
        import dataclasses
        import jax.numpy as jnp
        bufs = self.scene_buffers
        if bufs is None or name not in bufs.material_names:
            return False
        row = bufs.material_names.index(name)
        for key, val in params.items():
            span = self._MATERIAL_COLS.get(key)
            if span is None:
                return False
            off, width = span
            bufs.materials[row, off:off + width] = np.asarray(
                val, np.float32).reshape(width)
        mat = self.material_lib.get(name)
        if mat is not None:
            for key, val in params.items():
                if hasattr(mat, key):
                    setattr(mat, key, val)
        new_m = jnp.asarray(bufs.materials)
        r = self.renderer
        r._scene = dataclasses.replace(r._scene, materials=new_m)
        if getattr(r, "_scene_t", None) is not None:
            r._scene_t = dataclasses.replace(r._scene_t, materials=new_m)
        return True

    def editor_set_light(self, index: int, **params) -> bool:
        """Mutate a light (brightness, color, position, ...). Shadow-map
        caches invalidate so caster edits re-render their maps."""
        if not (0 <= index < len(self.lights)):
            return False
        light = self.lights[index]
        for key, val in params.items():
            if not hasattr(light, key):
                return False
            setattr(light, key, val)
        self._static_shadow_maps = None
        return True

    def editor_set_object_transform(self, item_name: str, position=None,
                                    rotation=None, scale=None) -> bool:
        """Move/rotate/scale a scene object by DrawItem name; per-frame
        world matrices rebuild from the transforms, so the edit is live."""
        if self.scene_buffers is None:
            return False
        hit = False
        for it in self.scene_buffers.items:
            if it.name == item_name:
                if position is not None:
                    it.transform.position = np.asarray(position, np.float32)
                if rotation is not None:
                    it.transform.rotation = np.asarray(rotation, np.float32)
                if scale is not None:
                    it.transform.scale = np.asarray(scale, np.float32)
                hit = True
        if hit:
            self._static_shadow_maps = None   # geometry moved
        return hit

    def _log_periodic_stats(self) -> None:
        """Frame pacing log every 4 seconds (VQEngine_Simulation.cpp:47-55)
        + FRenderStats (the F2 profiler window's data)."""
        now = time.perf_counter()
        if now - self._last_stats_log < 4.0 or not self._frame_times:
            return
        ft = np.asarray(self._frame_times[-256:])
        s = self.renderer.stats
        log.info(
            f"[profiler] frame {self.num_ticks}: "
            f"{1.0 / max(ft.mean(), 1e-9):.1f} FPS ({ft.mean()*1e3:.2f} ms avg, "
            f"{ft.max()*1e3:.2f} ms max) | tris {s.num_draws} | "
            f"frames rendered {s.num_frames_rendered}")
        self._last_stats_log = now

    def tick(self, dt: float = 1 / 60):
        """One simulation tick: events -> input -> update -> render
        (SimulationThread_Tick, VQEngine_Simulation.cpp:88-105)."""
        t0 = time.perf_counter()
        # finalize async loads whose host work completed
        if self._scene_future is not None:
            self.poll_scene_loading()
        if self._env_future is not None and self._env_future.done():
            eq = self._env_future.result()
            self._env_future = None
            self.environment = self._build_environment_maps(eq)
        self.handle_events()
        if self.scene_buffers is None:
            return self._last_output     # still LOADING: nothing to render
        self.handle_engine_input(dt)
        if self.scene_update_hook is not None:
            self.scene_update_hook(self, dt)
        out = self.render_frame(readback=False)
        self._render_extra_contexts()
        self.input.post_update()
        self.num_ticks += 1
        # frame-rate limiter (Settings.h:47, VQEngine_Update.cpp:343-368)
        if self.gfx.MaxFrameRate > 0:
            target = 1.0 / self.gfx.MaxFrameRate
            elapsed = time.perf_counter() - t0
            if elapsed < target:
                time.sleep(target - elapsed)
        self._frame_times.append(time.perf_counter() - t0)
        self._log_periodic_stats()
        return out

    # ------------------------------------------------------------------
    def run(self) -> int:
        """Main loop. With -Test, runs NumAutomatedTestFrames frames and
        exits 0 on success (the Scripts/TestVQE.bat contract)."""
        scene = self.settings.SceneName or self.settings.StartupScene
        # loading screen (LoadingScreenRendering.cpp behavior)
        out_dir = Path(self.settings.OutputDir)
        try:
            from ..render.hud import loading_screen
            ls = loading_screen(self.settings.Width, self.settings.Height,
                                data_dirs=self.data_dirs)
            out_dir.mkdir(parents=True, exist_ok=True)
            write_png(out_dir / "loading.png", ls)
        except Exception:  # noqa: BLE001 — cosmetic only
            pass
        if not self.start_loading_scene(scene):
            return 1
        n_frames = (self.settings.NumAutomatedTestFrames
                    if self.settings.bAutomatedTestRun else 1)
        t0 = time.perf_counter()
        last = None
        try:
            for i in range(n_frames):
                last = self.tick()
                # failure detection (the debug-layer/device-removed analog,
                # VQEngine_Render.cpp:386-416): a cheap device-side finite
                # reduce every 16 frames catches a NaN frame within 16
                # ticks instead of only at exit
                if (i & 15) == 15 and last is not None:
                    import jax.numpy as jnp
                    if not bool(np.asarray(jnp.isfinite(last.ldr).all())):
                        log.error(f"non-finite pixels at frame {self.num_ticks}")
                        return 2
                    # binning-capacity probe: dropped pairs mean silently
                    # missing geometry (the failure class that ate Sponza's
                    # walls in round 2) — abort loudly instead
                    if last.overflow is not None:
                        ov = np.asarray(last.overflow)
                        if int(ov.sum()) != 0:
                            log.error(
                                f"raster bin overflow at frame "
                                f"{self.num_ticks}: dropped (fine, row, "
                                f"global) pairs = {ov.tolist()}")
                            return 3
                    # adaptive-path capacity probe: demand/cap > 1 means
                    # quality silently degraded past a compaction cap —
                    # warn loudly (same contract as bin overflow; the
                    # fallbacks are defined and never alias, so warn
                    # rather than abort)
                    if last.saturation:
                        for k, v in last.saturation.items():
                            frac = float(np.asarray(v))
                            if frac > 1.0:
                                log.warning(
                                    f"adaptive cap saturated at frame "
                                    f"{self.num_ticks}: {k} demand = "
                                    f"{frac:.2f}x capacity (quality "
                                    f"degraded on the overflow pixels)")
                            elif (frac == 0.0
                                  and not k.endswith("_demand")
                                  and float(np.asarray(last.saturation.get(
                                      k + "_demand", 0.0))) > 1.0):
                                # ladder retreated to its all-False rung
                                # while real demand existed: the adaptive
                                # pass ran on NOTHING (the r5 tex_aniso
                                # shed — rungs too coarse for the demand)
                                log.warning(
                                    f"adaptive pass shed everything at "
                                    f"frame {self.num_ticks}: {k} = 0 "
                                    f"with over-cap demand")
        except Exception as e:  # noqa: BLE001
            log.error(f"frame {self.num_ticks} failed: {e}")
            raise
        # readback + dump the final frame
        img = np.asarray(last.ldr)
        if not (np.isfinite(img).all()):
            log.error("non-finite pixels in final frame")
            return 2
        elapsed = time.perf_counter() - t0
        log.info(f"{n_frames} frames in {elapsed:.3f}s "
                 f"({elapsed/max(1,n_frames)*1e3:.2f} ms/frame avg, "
                 f"{self.settings.Width}x{self.settings.Height})")
        out_dir.mkdir(parents=True, exist_ok=True)
        # stamp the profiler HUD (the F2 window) onto the dumped frame
        try:
            from ..render.hud import draw_profiler_hud
            ft = np.asarray(self._frame_times) if self._frame_times else np.asarray([elapsed])
            img = draw_profiler_hud(img, {
                "fps": 1.0 / max(float(ft.mean()), 1e-9),
                "ms": float(ft.mean()) * 1e3,
                "tris": self.renderer.stats.num_draws,
                "scene": self.scene_name,
                "frame": self.num_ticks,
            })
        except Exception:  # noqa: BLE001 — cosmetic only
            pass
        frame_path = out_dir / f"{self.scene_name}_frame{self.num_ticks:04d}.png"
        write_png(frame_path, img)
        log.info(f"wrote {frame_path}")
        # secondary render contexts present to their own files (the
        # debug window's swapchain present)
        for cname, ctx in getattr(self, "_render_contexts", {}).items():
            if ctx["last"] is not None:
                p = out_dir / f"{self.scene_name}_{cname}.png"
                write_png(p, np.asarray(ctx["last"].ldr))
                log.info(f"wrote {p} (render context '{cname}')")
        if self.gfx.bHDR and last.hdr is not None:
            # HDR10 output path: the swapchain-format analog — re-encode
            # the LAST frame's pre-tonemap image to ST2084 (SwapChain.h:
            # 76-99 color spaces). Re-encoding the kept scene-referred
            # buffer replaces the full re-render this used to cost.
            # Brightness comes from the selected display profile clamped
            # by the environment's MaxCLL — the values the reference feeds
            # into swapchain HDR metadata (SetHDRMetaData, SwapChain.h).
            import jax as _jax
            from ..ops import colorspace as _cs
            from ..ops import postprocess as _pp
            brightness = self.hdr_display_brightness()
            enc = _jax.jit(lambda h: _pp.tonemap(
                h, _cs.DISPLAY_CURVE_ST2084, apply_gamma=True,
                display_reference_brightness=brightness))
            hdr_path = out_dir / f"{self.scene_name}_hdr10.png"
            write_png(hdr_path, np.asarray(enc(last.hdr)))
            log.info(f"wrote {hdr_path} (ST2084/PQ @ {brightness:.0f} nits, "
                     f"profile '{self.settings.HDRProfile}', "
                     f"MaxCLL {self._env_max_cll:.0f})")
        self.state = EAppState.EXITING
        return 0
