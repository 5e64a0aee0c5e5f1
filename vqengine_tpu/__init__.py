"""vqengine_tpu — a TPU-native real-time rendering framework.

A from-scratch rebuild of the capabilities of VQEngine (a multi-threaded
DirectX 12 forward-PBR renderer; see /root/reference) on JAX/XLA/Pallas:

- The D3D12 device/queues/fences/swapchain collapse into jitted render
  graphs over HBM-resident framebuffer tensors (see ``render/graph.py``).
- Rasterizing draw calls become a clipless, tile-binned Pallas rasterizer
  (``ops/rasterizer.py``).
- The HLSL shader set (BRDF.hlsl, ForwardLighting.hlsl, Tonemapper.hlsl, …)
  becomes vectorized jnp/Pallas kernels (``ops/``).
- The scene/data model (XML levels, glTF 2.0 models, INI settings, built-in
  procedural meshes) is preserved (``scene/``, ``utils/config.py``).

Layout:
    utils/     math, config (INI+CLI), logging, image IO, profiling
    scene/     meshes, materials, lights, cameras, scenes, asset loading
    ops/       device-side kernels: raster, shading, culling, post-process
    render/    render targets, render graph, renderer ("PSO" cache = jit cache)
    engine/    app shell: state machine, frame loop, CLI contract
    parallel/  multi-chip meshes and shardings (screen-tile / view parallel)
"""

__version__ = "0.1.0"
