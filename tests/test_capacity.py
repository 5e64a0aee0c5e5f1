"""Capacity-headroom contract on the REAL bench scene (VERDICT r4 #5).

BENCH_r04 died on `tex_aniso demand = 1.018x cap` — a contract violation
that only an end-to-end render of the actual stress scene could catch
(unit tests check value parity, not demand-vs-cap on real content). This
test renders the exact bench scene (imported from bench.py, same seed 42
colonnade + clutter + light budget) at the bench resolution on CPU, at
the camera-sweep extremes, and asserts:

  * every non-`_demand` adaptive-compaction saturation <= 1.0
    (the capacity-aware threshold ladders must always have a satisfiable
    rung — ops/texture.py's top rung at max_aniso, added for this)
  * raster bin overflow == 0 (a GPU never silently drops fragments)

Marked slow: one 1080p full-config frame on the 1-core CPU host takes
minutes. The default lane gets a quarter-res variant of the same
contract, which reproduces the r4 failure class (demand scales with
resolution but caps are resolution-proportional: n // frac).
"""
import numpy as np
import pytest


def _render_extremes(width, height, yaws=(-94.0, -90.0, -86.0)):
    import jax
    import jax.numpy as jnp

    from bench import build_sponza_stress
    from vqengine_tpu.ops.ibl import procedural_sky_equirect
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    buffers, lights, textures = build_sponza_stress()
    scene = graph.upload_scene(buffers)
    env = graph.build_environment(procedural_sky_equirect(128, 64))
    slots_used = graph.slots_used_of(buffers.materials)

    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg = 15.0
    p.yaw_deg = -90.0
    p.fov_v_deg = 60.0
    p.near_z, p.far_z = 0.5, 4000.0
    cam = Camera(p, aspect=width / height)
    renderer = VQRendererTPU()

    shadow_maps = None
    results = []
    for yaw in yaws:
        cam.yaw = yaw
        consts = renderer.build_frame_constants(buffers, cam, lights)
        if shadow_maps is None:
            shadow_maps = jax.jit(graph.render_shadow_maps)(scene, consts)

        out = jax.jit(lambda s, c, e, sm, tx: graph.render_forward(
            s, c, width=width, height=height,
            enable_shadows=True, enable_ssao=True, enable_ssr=True,
            msaa=True, textures=tx, aniso_taps=8, slots_used=slots_used,
            enable_motion_vectors=True, dynamic_item_ids=(),
            env=e, shadow_maps=sm))(scene, consts, env, shadow_maps,
                                    textures)
        sat = {k: float(np.asarray(v)) for k, v in
               out.get("saturation", {}).items()}
        results.append({
            "yaw": yaw,
            "overflow": int(np.asarray(out["overflow"]).max()),
            "coverage": float(np.asarray((out["tri_id"] >= 0).mean())),
            "saturation": sat,
        })
    return results


def _assert_contract(results):
    for r in results:
        assert r["overflow"] == 0, \
            f"bin overflow at yaw={r['yaw']}: {r['overflow']}"
        assert r["coverage"] > 0.5, \
            f"frame mostly empty at yaw={r['yaw']}: {r['coverage']}"
        for k, v in r["saturation"].items():
            if not k.endswith("_demand"):
                assert v <= 1.0, (
                    f"adaptive cap saturated at yaw={r['yaw']}: "
                    f"{k} = {v}x cap (the threshold ladder must have a "
                    f"satisfiable rung — see ops/texture.py ANISO_THRS)")
                # the dual failure mode (r5 BENCH 171.9): a ladder that
                # retreats to the all-False rung sheds the WHOLE adaptive
                # pass while demand exists — the budget must buy the worst
                # pixels, not nothing (unclamped-score rungs, ANISO_THRS)
                dem = r["saturation"].get(k + "_demand")
                if dem is not None and dem > 1.0:
                    assert v > 0.0, (
                        f"adaptive pass shed everything at yaw={r['yaw']}: "
                        f"{k} = 0 at demand {dem}x cap (ladder rungs too "
                        f"coarse to subdivide the demand)")


def test_capacity_headroom_quarter_res():
    """Default-lane contract at 960x540 (same caps-per-pixel ratio as the
    bench; this config reproduces the BENCH_r04 tex_aniso saturation when
    the ANISO_THRS top rung is below the max_aniso clamp)."""
    _assert_contract(_render_extremes(960, 540, yaws=(-90.0,)))


@pytest.mark.slow
def test_capacity_headroom_bench_1080p():
    """Full bench contract: 1920x1080 at the camera-sweep extremes
    (bench.py sweeps yaw = -90 + 4 sin — extremes at +/-4 deg)."""
    _assert_contract(_render_extremes(1920, 1080))


def test_pair_cap_bucket_properties():
    from vqengine_tpu.ops import raster
    # floor: small scenes share one 64k bucket (no recompile treadmill)
    assert raster.pair_cap_bucket(0) == 65536
    assert raster.pair_cap_bucket(30000) == 65536
    # {2^k, 1.5*2^k} ladder >= 1.5x demand, GROUP-aligned, monotone
    assert raster.pair_cap_bucket(42409) == 65536
    assert raster.pair_cap_bucket(50000) == 98304
    assert raster.pair_cap_bucket(131072) == 196608
    for d in (0, 1, 40000, 99999, 10**6):
        b = raster.pair_cap_bucket(d)
        assert 2 * b >= 3 * d and b % raster.GROUP == 0
    assert (raster.pair_cap_bucket(100000)
            >= raster.pair_cap_bucket(50000))
    # t clamps at bin_triangles' own safe default
    safe = 1024 + max(8192, 1024 // 4)
    assert raster.pair_cap_bucket(10**9, t=1024) <= \
        -(-safe // raster.GROUP) * raster.GROUP


def test_tight_pair_cap_bitwise_parity():
    """Binning is capacity-INVARIANT while demand <= cap (dead pairs
    sort past every bin segment): the demand-sized bucket must
    reproduce the default-cap frame bit for bit, with zero overflow."""
    import jax

    from bench import build_sponza_stress
    from vqengine_tpu.ops import raster
    from vqengine_tpu.render import graph
    from vqengine_tpu.render.renderer import VQRendererTPU
    from vqengine_tpu.scene.camera import Camera, FCameraParameters

    w, h = 480, 272
    buffers, lights, textures = build_sponza_stress()
    scene = graph.upload_scene(buffers)
    p = FCameraParameters()
    p.position = np.array([700, 170, -50], np.float32)
    p.pitch_deg, p.yaw_deg = 15.0, -90.0
    p.fov_v_deg, p.near_z, p.far_z = 60.0, 0.5, 4000.0
    cam = Camera(p, aspect=w / h)
    consts = VQRendererTPU().build_frame_constants(buffers, cam, lights)

    dem = int(np.asarray(jax.jit(
        lambda s, c: graph.probe_pair_demand(s, c, w, h))(scene, consts)))
    bucket = raster.pair_cap_bucket(dem, int(scene.num_tris_live))
    assert bucket >= 2 * dem

    def render(cap):
        return jax.jit(lambda s, c: graph.render_forward(
            s, c, width=w, height=h, msaa=True,
            pair_capacity=cap))(scene, consts)

    a = render(None)
    b = render(bucket)
    assert int(np.asarray(b["overflow"]).max()) == 0
    assert int(np.asarray(b["pair_demand"])) == dem
    assert np.array_equal(np.asarray(a["depth"]), np.asarray(b["depth"]))
    assert np.array_equal(np.asarray(a["ldr"]), np.asarray(b["ldr"]))
