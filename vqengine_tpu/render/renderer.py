"""VQRendererTPU — counterpart of the reference VQRenderer (Renderer.h:123-516).

The D3D12 machinery it replaces:
- device/queues/fences/allocators  -> the JAX runtime + XLA async streams
- PSO cache (PipelineStateObjects)  -> a jit-specialization cache keyed by
  (resolution, output curve, gamma): each key compiles one render graph
- descriptor heaps / CB rings       -> HBM-resident pytrees
- swapchain present                 -> host readback (device_get) + PNG dump

FRenderStats (Renderer.h:85-94) is preserved for the profiler HUD.
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import numpy as np

from ..ops import colorspace as cs
from ..scene.light import (ELightType, NUM_LIGHTS_POINT, NUM_LIGHTS_SPOT,
                           NUM_SHADOWING_LIGHTS_POINT,
                           NUM_SHADOWING_LIGHTS_SPOT,
                           pack_directional, pack_point_lights,
                           pack_spot_extra, pack_spot_lights)
from ..utils.log import info
from . import graph
from .scene_buffers import SceneBuffers


@dataclass
class FRenderStats:
    """Reference Renderer.h:85-94."""
    num_frames_rendered: int = 0
    num_draws: int = 0
    num_dispatches: int = 0
    last_frame_ms: float = 0.0


@dataclass
class FrameOutput:
    ldr: np.ndarray          # [H, W, 3] display-ready
    depth: np.ndarray | None = None
    tri_id: np.ndarray | None = None
    object_id: np.ndarray | None = None  # picking buffer (ObjectIDPass)
    ao: np.ndarray | None = None
    motion: np.ndarray | None = None
    ssr_history: np.ndarray | None = None
    overflow: np.ndarray | None = None  # [3] dropped (pairs, row pairs, globals)
    hdr: np.ndarray | None = None    # pre-tonemap scene-referred [H, W, 3]
    saturation: dict | None = None   # adaptive-path demand/cap fractions
    pair_demand: np.ndarray | None = None  # raster pair demand this frame


class VQRendererTPU:
    def __init__(self, gfx_settings=None):
        self.gfx = gfx_settings
        self.stats = FRenderStats()
        self._scene: graph.DeviceScene | None = None
        self._render_fns: dict = {}   # the "PSO cache"
        # demand-sized binning capacity (raster.pair_cap_bucket): None =
        # the safe T-sized default; adopted from measured frame demand,
        # sticky upward (shrinking would churn recompiles), reset to safe
        # on overflow (the GPU bin-buffer flush-and-resize analog)
        self._pair_bucket: int | None = None
        self._pair_demand_max: int = 0

    # ------------------------------------------------------------------
    def load_scene(self, buffers: SceneBuffers) -> None:
        from .scene_buffers import split_transparent
        opaque, transparent = split_transparent(buffers)
        self._scene = graph.upload_scene(opaque)
        self._pair_bucket = None
        self._pair_demand_max = 0
        self._scene_t = (graph.upload_scene(transparent)
                         if transparent is not None else None)
        self._buffers = buffers
        # alpha-mask PSO permutation analog (ENABLE_ALPHA_MASK): on when
        # any material carries a dedicated alpha-mask map (slot 3 id,
        # material row 23)
        self._any_alpha_mask = bool((buffers.materials[:, 23] >= 0).any())
        # static texture-slot usage (the texture-config PSO permutation):
        # slots no material references never sample
        self._slots_used = graph.slots_used_of(buffers.materials)
        info(f"renderer: scene uploaded — {buffers.positions.shape[0]} verts, "
             f"{buffers.indices.shape[0]} tris "
             f"({0 if transparent is None else transparent.indices.shape[0]}"
             f" transparent), {buffers.num_items} items, "
             f"{buffers.materials.shape[0]} materials")

    def _get_render_fn(self, width: int, height: int, curve: int, gamma: bool,
                       enable_shadows: bool = True,
                       shadow_dims: tuple[int, int, int] | None = None,
                       has_env: bool = False, enable_ssao: bool = False,
                       enable_motion: bool = False,
                       has_textures: bool = False, msaa: bool = False,
                       enable_ssr: bool = False, has_ssr_history: bool = False,
                       render_scale: float = 1.0,
                       cas_sharpness: float | None = None,
                       shadow_filter: str = "esm",
                       has_shadow_maps: bool = False,
                       enable_alpha_mask: bool = False,
                       has_transparent: bool = False,
                       aniso_taps: int = 0,
                       slots_used: tuple | None = None,
                       ssao_quality: str = "medium",
                       dynamic_item_ids: tuple | None = None,
                       pair_capacity: int | None = None):
        from ..ops import shadow as shadow_ops
        if dynamic_item_ids is not None and len(dynamic_item_ids) > 16:
            # motion_vectors collapses sets > 16 to the palette path; a
            # raw superset tuple in the cache key would recompile an
            # IDENTICAL program (2-15 min on the TPU) for every sticky-set
            # growth past 16 — normalize before keying (ADVICE r4)
            dynamic_item_ids = None
        if shadow_dims is None:
            shadow_dims = (shadow_ops.SPOT_SHADOW_DIM,
                           shadow_ops.POINT_SHADOW_DIM,
                           shadow_ops.DIRECTIONAL_SHADOW_DIM)
        key = (width, height, curve, gamma, enable_shadows, shadow_dims,
               has_env, enable_ssao, enable_motion, has_textures, msaa,
               enable_ssr, has_ssr_history, render_scale, cas_sharpness,
               shadow_filter, has_shadow_maps, enable_alpha_mask,
               has_transparent, aniso_taps, slots_used, ssao_quality,
               dynamic_item_ids, pair_capacity)
        fn = self._render_fns.get(key)
        if fn is None:
            rw = max(64, int(width * render_scale)) if render_scale != 1.0 else width
            rh = max(64, int(height * render_scale)) if render_scale != 1.0 else height
            kwargs = dict(width=rw, height=rh,
                          out_width=width, out_height=height,
                          cas_sharpness=cas_sharpness,
                          shadow_filter=shadow_filter,
                          output_display_curve=curve, apply_gamma=gamma,
                          enable_shadows=enable_shadows,
                          shadow_dims=shadow_dims, enable_ssao=enable_ssao,
                          enable_motion_vectors=enable_motion, msaa=msaa,
                          enable_ssr=enable_ssr,
                          enable_alpha_mask=enable_alpha_mask,
                          aniso_taps=aniso_taps, slots_used=slots_used,
                          ssao_quality=ssao_quality,
                          dynamic_item_ids=dynamic_item_ids,
                          pair_capacity=pair_capacity)

            def wrapped(scene, scene_t, consts, env, textures, ssr_history,
                        shadow_maps):
                return graph.render_forward(scene, consts, env=env,
                                            textures=textures,
                                            ssr_history=ssr_history,
                                            shadow_maps=shadow_maps,
                                            scene_transparent=scene_t,
                                            **kwargs)
            fn = jax.jit(wrapped, static_argnames=())
            self._render_fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    def build_frame_constants(self, buffers: SceneBuffers, camera,
                              lights, ambient_factor: float = 0.055,
                              clear_color=(0.07, 0.07, 0.12),
                              hdri_yaw: float = 0.0,
                              prev_world: np.ndarray | None = None,
                              prev_view_proj: np.ndarray | None = None
                              ) -> graph.FrameConstants:
        """Gathers the per-frame light/matrix data — the counterpart of
        Scene::GatherSceneLightData (Scene.cpp:978) + the CB fills."""
        import jax.numpy as jnp

        world, nrm = buffers.world_matrices()
        enabled = [l for l in lights if l.enabled]
        points = [l for l in enabled if l.type == ELightType.POINT and not l.casts_shadows]
        spots = [l for l in enabled if l.type == ELightType.SPOT and not l.casts_shadows]
        point_casters = [l for l in enabled
                         if l.type == ELightType.POINT and l.casts_shadows][:NUM_SHADOWING_LIGHTS_POINT]
        spot_casters = [l for l in enabled
                        if l.type == ELightType.SPOT and l.casts_shadows][:NUM_SHADOWING_LIGHTS_SPOT]
        dirs = [l for l in enabled if l.type == ELightType.DIRECTIONAL]

        p_cap = max(1, min(len(points), NUM_LIGHTS_POINT))
        s_cap = max(1, min(len(spots), NUM_LIGHTS_SPOT))
        p_packed, _ = pack_point_lights(points, p_cap)
        s_packed, _ = pack_spot_lights(spots, s_cap)
        s_extra = pack_spot_extra(spots, s_cap)
        d_packed = pack_directional(dirs[0] if dirs else None)

        # shadow caster data (exact counts -> graph specializes per scene)
        sc = len(spot_casters)
        sc_packed, _ = pack_spot_lights(spot_casters, max(sc, 0) or 0) if sc else (np.zeros((0, 12), np.float32), 0)
        sc_extra = pack_spot_extra(spot_casters, sc) if sc else np.zeros((0, 4), np.float32)
        sc_vps = np.stack([l.view_projection() for l in spot_casters]) if sc \
            else np.zeros((0, 4, 4), np.float32)

        pc = len(point_casters)
        pc_packed, _ = pack_point_lights(point_casters, pc) if pc else (np.zeros((0, 12), np.float32), 0)
        pc_vps = (np.stack([[l.view_projection(f) for f in range(6)]
                            for l in point_casters])
                  if pc else np.zeros((0, 6, 4, 4), np.float32))
        pc_range = (np.asarray([[l.shadow_near, l.shadow_far]
                                for l in point_casters], np.float32)
                    if pc else np.zeros((0, 2), np.float32))

        # dir_vp shape encodes the static has-dir-shadow flag: [1,4,4] or [0,4,4]
        dir_caster = dirs[0] if (dirs and dirs[0].casts_shadows) else None
        dir_vp = (dir_caster.view_projection()[None]
                  if dir_caster is not None else np.zeros((0, 4, 4), np.float32))

        from ..utils import math3d as m3
        vp = camera.view_projection()
        return graph.FrameConstants(
            world=jnp.asarray(world),
            normal_mats=jnp.asarray(nrm),
            view_proj=jnp.asarray(vp),
            camera_pos=jnp.asarray(camera.position),
            frustum_planes=jnp.asarray(m3.frustum_planes_from_viewproj(vp)),
            inv_view_proj=jnp.asarray(np.linalg.inv(vp).astype(np.float32)),
            hdri_yaw=jnp.asarray(hdri_yaw, jnp.float32),
            view_matrix=jnp.asarray(camera.view_matrix()),
            proj_params=jnp.asarray(np.asarray(
                [camera.near_z, camera.far_z,
                 camera.fov_v_deg * np.pi / 180.0, camera.aspect], np.float32)),
            prev_world=jnp.asarray(prev_world if prev_world is not None else world),
            prev_view_proj=jnp.asarray(prev_view_proj.astype(np.float32)
                                       if prev_view_proj is not None else vp),
            point_lights=jnp.asarray(p_packed),
            spot_lights=jnp.asarray(s_packed),
            spot_extra=jnp.asarray(s_extra),
            directional=jnp.asarray(d_packed),
            ambient_factor=jnp.asarray(ambient_factor, jnp.float32),
            clear_color=jnp.asarray(np.asarray(clear_color, np.float32)),
            spot_casters=jnp.asarray(sc_packed),
            spot_caster_extra=jnp.asarray(sc_extra),
            spot_caster_vps=jnp.asarray(sc_vps.astype(np.float32)),
            point_casters=jnp.asarray(pc_packed),
            point_caster_vps=jnp.asarray(pc_vps.astype(np.float32)),
            point_caster_range=jnp.asarray(pc_range),
            dir_vp=jnp.asarray(dir_vp.astype(np.float32)),
        )

    # ------------------------------------------------------------------
    def precompute_shadow_maps(self, consts: graph.FrameConstants,
                               shadow_dims=None, filter_mode: str = "esm"):
        """Render caster shadow maps once (STATIC/STATIONARY light
        mobility, Light.h:45-186): static scenes skip the per-frame shadow
        renders entirely."""
        from ..ops import shadow as shadow_ops
        if shadow_dims is None:
            shadow_dims = (shadow_ops.SPOT_SHADOW_DIM,
                           shadow_ops.POINT_SHADOW_DIM,
                           shadow_ops.DIRECTIONAL_SHADOW_DIM)
        fn = jax.jit(functools.partial(graph.render_shadow_maps,
                                       shadow_dims=shadow_dims,
                                       filter_mode=filter_mode))
        return fn(self._scene, consts)

    # ------------------------------------------------------------------
    def render(self, consts: graph.FrameConstants, width: int, height: int,
               hdr10: bool = False, readback: bool = True,
               enable_shadows: bool = True,
               shadow_dims: tuple[int, int, int] | None = None,
               env: "graph.EnvironmentMaps | None" = None,
               enable_ssao: bool = False,
               enable_motion: bool = False,
               textures: tuple | None = None,
               msaa: bool = False,
               enable_ssr: bool = False,
               ssr_history=None,
               render_scale: float = 1.0,
               cas_sharpness: float | None = None,
               shadow_maps: dict | None = None,
               aniso_taps: int = 0,
               shadow_filter: str = "esm",
               ssao_quality: str = "medium",
               dynamic_item_ids: tuple | None = None) -> FrameOutput:
        assert self._scene is not None, "load_scene first"
        curve = cs.DISPLAY_CURVE_ST2084 if hdr10 else cs.DISPLAY_CURVE_SRGB
        scene_t = getattr(self, "_scene_t", None)
        fn = self._get_render_fn(width, height, curve, True,
                                 enable_shadows, shadow_dims,
                                 has_env=env is not None,
                                 enable_ssao=enable_ssao,
                                 enable_motion=enable_motion,
                                 has_textures=textures is not None,
                                 msaa=msaa, enable_ssr=enable_ssr,
                                 has_ssr_history=ssr_history is not None,
                                 render_scale=render_scale,
                                 cas_sharpness=cas_sharpness,
                                 shadow_filter=shadow_filter,
                                 has_shadow_maps=shadow_maps is not None,
                                 enable_alpha_mask=getattr(
                                     self, "_any_alpha_mask", False),
                                 has_transparent=scene_t is not None,
                                 aniso_taps=aniso_taps,
                                 slots_used=getattr(self, "_slots_used",
                                                    None),
                                 ssao_quality=ssao_quality,
                                 dynamic_item_ids=dynamic_item_ids,
                                 pair_capacity=self._pair_bucket)
        t0 = time.perf_counter()
        out = fn(self._scene, scene_t, consts, env, textures, ssr_history,
                 shadow_maps)
        ldr = out["ldr"]
        if readback:
            ldr = np.asarray(jax.device_get(ldr))
            self._update_pair_bucket(out)
        self.stats.num_frames_rendered += 1
        self.stats.num_draws = int(self._buffers.indices.shape[0])
        self.stats.last_frame_ms = (time.perf_counter() - t0) * 1e3
        return FrameOutput(ldr=ldr, depth=out["depth"], tri_id=out["tri_id"],
                           object_id=out.get("object_id"),
                           ao=out.get("ao"), motion=out.get("motion"),
                           ssr_history=out.get("ssr_history"),
                           overflow=out.get("overflow"),
                           hdr=out.get("hdr"),
                           saturation=out.get("saturation"),
                           pair_demand=out.get("pair_demand"))

    def _update_pair_bucket(self, out: dict) -> None:
        """Adopt a demand-sized binning capacity from the measured frame
        (raster.pair_cap_bucket): sticky upward; overflow resets to the
        safe T-sized default and the bucket re-grows from fresh demand.
        Only called on readback frames — the scalar sync is free there
        (the ldr readback already waited)."""
        from ..ops import raster
        dem = out.get("pair_demand")
        if dem is None or self._scene is None:
            return
        ov = out.get("overflow")
        if (ov is not None and self._pair_bucket is not None
                and int(np.asarray(ov).sum()) > 0):
            info(f"renderer: pair bucket {self._pair_bucket} overflowed — "
                 f"resetting to the safe default cap")
            self._pair_bucket = None
            self._pair_demand_max = 0
            return
        self._pair_demand_max = max(self._pair_demand_max,
                                    int(np.asarray(dem)))
        t = int(self._scene.num_tris_live)
        bucket = raster.pair_cap_bucket(self._pair_demand_max, t)
        if bucket >= raster.default_pair_cap(t):
            return  # no smaller than the safe default — skip the recompile
        if self._pair_bucket is None or bucket > self._pair_bucket:
            self._pair_bucket = bucket
