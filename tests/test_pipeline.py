"""Full-frame pipeline tests (small resolution)."""

import numpy as np
import pytest

from capsaicin_tpu.render import RenderOptions, RenderSession
from capsaicin_tpu.render.settings import OUTPUT_DIRECT, OUTPUT_INDIRECT, OUTPUT_VARIANCE
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

W, H = 64, 64


@pytest.fixture(scope="module")
def cornell_session():
    session = RenderSession(width=W, height=H, traversal="brute")
    session.set_camera(make_camera("cornell", W, H))
    session.set_scene(build_scene(cornell_box()))
    return session


def test_render_frame_basic(cornell_session):
    s = cornell_session
    s.reset()
    img = s.render()
    assert img.shape == (H, W, 3)
    assert np.all(np.isfinite(img))
    assert img.min() >= 0.0
    # sky pixels (corners look past the open front) are the gamma-encoded sky
    sky = 0.7 ** (1 / 2.2)
    assert abs(img[0, 0, 0] - sky) < 0.05


def test_temporal_accumulation_grows_history(cornell_session):
    s = cornell_session
    s.reset()
    for _ in range(5):
        s.render()
    hist_len = np.asarray(s.state.moments_history[..., 3], np.float32)
    depth = np.asarray(s.state.prev_nd_depth)
    # hit pixels that stayed valid accumulate history each frame
    assert hist_len[depth > 0].max() >= 4.0
    assert int(s.state.frame_count) == 5


def test_frames_converge(cornell_session):
    """With a static camera successive frames must converge (SVGF + TAA)."""
    s = cornell_session
    s.reset()
    prev = s.render()
    diffs = []
    for _ in range(6):
        cur = s.render()
        diffs.append(np.mean(np.abs(cur - prev)))
        prev = cur
    assert diffs[-1] < diffs[0] * 0.9 or diffs[-1] < 5e-3


def test_output_debug_modes():
    # DIRECT mode is covered by test_indirect_adds_energy; eaw5 off halves
    # the CPU compile of each variant without losing combine() coverage
    for mode in (OUTPUT_INDIRECT, OUTPUT_VARIANCE):
        s = RenderSession(
            width=32, height=32, traversal="brute",
            options=RenderOptions(output=mode, taa=False, eaw5=False),
        )
        s.set_camera(make_camera("cornell", 32, 32))
        s.set_scene(build_scene(cornell_box()))
        img = s.render()
        assert np.all(np.isfinite(img))


def test_indirect_adds_energy(cornell_session):
    """GI must brighten shadowed geometry vs direct-only."""
    from capsaicin_tpu.render.settings import OUTPUT_COMBINED

    s_direct = RenderSession(
        width=32, height=32, traversal="brute",
        options=RenderOptions(output=OUTPUT_DIRECT, taa=False, eaw5=False),
    )
    s_direct.set_camera(make_camera("cornell", 32, 32))
    scene = build_scene(cornell_box())
    s_direct.set_scene(scene)
    s_comb = RenderSession(
        width=32, height=32, traversal="brute",
        options=RenderOptions(output=OUTPUT_COMBINED, taa=False, eaw5=False),
    )
    s_comb.set_camera(make_camera("cornell", 32, 32))
    s_comb.set_scene(scene)
    for _ in range(3):
        d = s_direct.render()
        c = s_comb.render()
    assert c.mean() > d.mean() + 1e-3


def test_lowres_indirect_path():
    s = RenderSession(
        width=64, height=64, traversal="brute",
        options=RenderOptions(lowres_indirect=True, eaw5=False),
    )
    s.set_camera(make_camera("cornell", 64, 64))
    s.set_scene(build_scene(cornell_box()))
    for _ in range(4):  # cycle all 4 interleave phases
        img = s.render()
    assert np.all(np.isfinite(img))


def test_reset_restarts_accumulation(cornell_session):
    s = cornell_session
    s.reset()
    s.render()
    s.render()
    assert int(s.state.frame_count) == 2
    s.reset()
    assert int(s.state.frame_count) == 0


def test_multi_bounce_gi():
    """Regression: bounce >= 2 once crashed on a shadowed loop variable in
    the feedback path (float fraction clobbering the pixel grid)."""
    s = RenderSession(
        width=32, height=32, traversal="brute",
        options=RenderOptions(num_diffuse_bounces=3, eaw5=False),
    )
    s.set_camera(make_camera("cornell", 32, 32))
    s.set_scene(build_scene(cornell_box()))
    img = s.render()
    assert np.all(np.isfinite(img))


def test_deinterleave2_equals_roll_form():
    """The reshape+dynamic-index deinterleave (round-5 lane-shuffle fix,
    +14% on the progressive config) must equal the reference formulation
    roll(x, (-oy,-ox))[::2, ::2] bit-exactly for every 2x2 phase."""
    import jax.numpy as jnp
    import numpy as np

    from capsaicin_tpu.render.passes import _deinterleave2

    rng = np.random.default_rng(5)
    for shape in [(16, 32), (16, 32, 2), (8, 256, 3)]:
        x = jnp.asarray(rng.random(shape).astype(np.float32))
        for oy in (0, 1):
            for ox in (0, 1):
                want = np.asarray(
                    jnp.roll(x, shift=(-oy, -ox), axis=(0, 1))[::2, ::2])
                got = np.asarray(
                    _deinterleave2(x, jnp.int32(oy), jnp.int32(ox)))
                np.testing.assert_array_equal(got, want)
