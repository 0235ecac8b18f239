"""Runtime option variants, resize, and the fp16 history mode."""

import dataclasses

import numpy as np

from capsaicin_tpu.render import RenderOptions, RenderSession
from capsaicin_tpu.render.settings import OUTPUT_DIRECT
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

W = H = 32


def _session(**opt_kw):
    s = RenderSession(
        width=W, height=H, traversal="brute", options=RenderOptions(**opt_kw)
    )
    s.set_camera(make_camera("cornell", W, H))
    s.set_scene(build_scene(cornell_box()))
    return s


def test_use_options_switch_keeps_history():
    """Flipping a static option mid-session (the ImGui toggle analog) must
    keep temporal accumulation running, not restart it."""
    s = _session(eaw5=False)
    for _ in range(3):
        s.render()
    assert int(s.state.frame_count) == 3
    s.use_options(dataclasses.replace(s.options, output=OUTPUT_DIRECT))
    img = s.render()
    assert np.all(np.isfinite(img))
    assert int(s.state.frame_count) == 4  # history survived the flip
    # switching back reuses the cached compiled variant
    base = dataclasses.replace(s.options, output=0)
    s.use_options(base)
    fn = s._fn_cache[base]
    s.render()
    assert s._frame_fn is fn


def test_precompile_variants_no_hitch():
    s = _session(eaw5=False)
    variants = [
        s.options,
        dataclasses.replace(s.options, output=OUTPUT_DIRECT),
        dataclasses.replace(s.options, denoise=False),
    ]
    n = s.precompile_variants(variants)
    assert n == 3
    assert s.precompile_variants(variants) == 0  # all cached now
    for v in variants:
        s.use_options(v)
        assert np.all(np.isfinite(s.render()))


def test_precompile_covers_full_panel_range():
    """The default precompile set covers EVERY single-field flip the viewer
    panel exposes — all output modes, each toggle, bounce counts 0..5
    (gui_system.cpp:69-91) — so no panel flip recompiles."""
    # minimal base options keep the CPU compile bill small; coverage of the
    # flip set is what is under test, not the pass content
    s = _session(eaw5=False, denoise=False, gather=False, taa=False,
                 num_diffuse_bounces=0)
    s.precompile_variants()
    flips = [
        dataclasses.replace(s.options, output=m) for m in range(4)
    ] + [
        dataclasses.replace(s.options, num_diffuse_bounces=b)
        for b in range(6)
    ] + [
        dataclasses.replace(s.options, **{f: not getattr(s.options, f)})
        for f in ("denoise", "eaw5", "gather", "taa")
    ]
    base = s.options
    for v in flips:
        s.use_options(v)
        assert s._frame_fn is not None, f"recompile hitch for {v}"
        s.use_options(base)  # return to the cached base state
    # a 2-hop combo compiles in the background from the flipped base
    first = dataclasses.replace(s.options, taa=True)
    s.use_options(first)
    t = s.precompile_background()
    t.join()
    second = dataclasses.replace(first, gather=True)
    s.use_options(second)
    assert s._frame_fn is not None, "background neighborhood missed the combo"
    assert np.all(np.isfinite(s.render()))


def test_resize_refits_aspect():
    s = _session(eaw5=False)
    s.render()
    s.resize(48, 24)
    assert s.width == 48 and s.height == 24
    sensor = np.asarray(s.camera.sensor_size)
    np.testing.assert_allclose(sensor[1], sensor[0] * 24 / 48, rtol=1e-6)
    img = s.render()
    assert img.shape == (24, 48, 3)
    assert int(s.state.frame_count) == 1  # resize resets accumulation


def test_inframe_pass_timings_sum_to_frame():
    """measure_pass_timings (in-frame method): one row per reference timer
    label, and the rows sum to ~the fused frame dispatch time (the isolated
    method's ~fixed-overhead-per-pass bias cancels in prefix differences)."""
    import time

    from capsaicin_tpu.render.profiling import PASS_NAMES

    s = _session(eaw5=False)
    s.render()
    t = s.measure_pass_timings(iters=2)
    assert set(t) == set(PASS_NAMES) | {"whole frame"}
    assert all(v >= 0.0 for v in t.values())
    pass_sum = sum(t[k] for k in PASS_NAMES)
    # timed frame for comparison (same dispatch structure as the prefix)
    t0 = time.perf_counter()
    s.render()
    frame = time.perf_counter() - t0
    # in-frame sums track the frame within noise (CPU timers are coarse;
    # assert the sum is the right ORDER, not a 7ms-per-pass overshoot)
    assert pass_sum < 3.0 * frame + 0.05, (pass_sum, frame)
    assert t["whole frame"] <= pass_sum + 1e-9


def test_inframe_pass_timings_mirror_options():
    """The profiled frame is the PRODUCT frame: passes the options disable
    (gather, taa) are absent from the table, and the spp accumulation loop
    is inside the 'RT Indirect diffuse' row rather than ignored."""
    from capsaicin_tpu.render.profiling import PASS_NAMES

    s = _session(eaw5=False, gather=False, taa=False, spp=2)
    s.render()
    t = s.measure_pass_timings(iters=1)
    assert set(t) == (set(PASS_NAMES) | {"whole frame"}) - {
        "Spatial gather", "TAA"}
    assert all(v >= 0.0 for v in t.values())


def test_fp16_history_mode():
    """history_dtype='float16' mirrors the reference's RGBA16F history
    textures (raytracing_system.cpp:466-575): it must converge like fp32
    with bounded drift."""
    s16 = _session(eaw5=False, history_dtype="float16")
    s32 = _session(eaw5=False, history_dtype="float32")
    for _ in range(6):
        img16 = s16.render()
        img32 = s32.render()
    assert s16.state.color_history.dtype == np.float16
    assert np.all(np.isfinite(img16))
    # fp16 storage quantization, accumulated over 6 frames, stays small in
    # the display-referred image
    rmse = float(np.sqrt(np.mean((img16.astype(np.float64) - img32) ** 2)))
    assert rmse < 5e-3, f"fp16 history drift RMSE {rmse}"
    # history length survives fp16 (max 256 cap needs exact small-int steps)
    hl16 = np.asarray(s16.state.moments_history[..., 3], np.float32)
    hl32 = np.asarray(s32.state.moments_history[..., 3], np.float32)
    np.testing.assert_allclose(hl16, hl32)


def test_precompile_background_kicks_coalesce():
    """Rapid panel flips kick precompile_background repeatedly; kicks must
    coalesce onto one worker (no duplicate compile threads) and the LAST
    request must still be honored."""
    s = _session(eaw5=False, denoise=False, gather=False, taa=False,
                 num_diffuse_bounces=0)
    v1 = [dataclasses.replace(s.options, output=OUTPUT_DIRECT)]
    v2 = [dataclasses.replace(s.options, output=3)]
    t1 = s.precompile_background(v1)
    t2 = s.precompile_background(v2)
    t1.join(timeout=300)
    if t2 is not t1:  # t1 may already have retired before the second kick
        t2.join(timeout=300)
    assert v1[0] in s._fn_cache or v2[0] in s._fn_cache
    # whichever kick the worker saw last is guaranteed; v1 may have been
    # replaced before pickup. The final state must include v2.
    assert v2[0] in s._fn_cache
