"""Web viewer server-side logic (no HTTP): vsync frame pacing."""

import time

import numpy as np

from capsaicin_tpu.render.settings import RenderOptions, default_settings
from capsaicin_tpu.scene.procedural import make_camera
from capsaicin_tpu.viewer.web import ViewerState


class _FakeSession:
    """Just enough session surface for ViewerState; render is instant so
    the measured interval is purely the pacing sleep."""

    def __init__(self):
        self.width = self.height = 8
        self.camera = make_camera("cornell", 8, 8)
        self.settings = default_settings()
        self.options = RenderOptions()

    def render(self, camera=None):
        return np.zeros((8, 8, 3), np.float32)


def test_fps_cap_paces_frames():
    """gui_system.h:22 vsync analog: with a 50 fps cap, consecutive frames
    are held >= 20 ms apart (the sleep is a hard lower bound); toggling the
    cap off stops the pacing clock from running ahead."""
    st = ViewerState(_FakeSession())
    st.step([], 0, 0)
    assert st.fps_cap == 0

    # capped at 50 fps: the second frame waits out the 20 ms interval
    st.step([], 0, 0, fps_cap=50)
    t0 = time.perf_counter()
    st.step([], 0, 0)
    assert time.perf_counter() - t0 >= 0.019
    assert st.fps_cap == 50

    # cap off: the next-frame deadline tracks now instead of accumulating,
    # so an immediate re-cap does not inherit a stale future deadline
    st.step([], 0, 0, fps_cap=0)
    assert st.fps_cap == 0
    assert st._next_frame <= time.perf_counter()


def test_page_has_live_timings_hud():
    """The per-pass timings table refreshes continuously (the reference
    overlays per-pass GPU ms every frame, gui_system.cpp:94-104): the page
    ships an interval-driven refresh plus the manual button, gated on a
    'live' toggle."""
    from capsaicin_tpu.viewer.web import _PAGE

    assert "refreshTimings" in _PAGE
    assert "setInterval" in _PAGE
    assert 'id="tlive"' in _PAGE
    assert "/timings" in _PAGE
