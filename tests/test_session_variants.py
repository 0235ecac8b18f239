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
