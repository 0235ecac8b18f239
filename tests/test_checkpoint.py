"""Checkpoint/resume of the temporal render state."""

import os

import numpy as np

from capsaicin_tpu.render import RenderOptions, RenderSession
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

W = H = 32
# eaw5 off halves the CPU compile; serialization coverage is unchanged
_OPT = RenderOptions(eaw5=False)


def test_save_load_state_resumes(tmp_path):
    scene = build_scene(cornell_box())
    s1 = RenderSession(width=W, height=H, traversal="brute", options=_OPT)
    s1.set_camera(make_camera("cornell", W, H))
    s1.set_scene(scene)
    for _ in range(3):
        s1.render()
    path = os.path.join(tmp_path, "ckpt.npz")
    s1.save_state(path)
    next_a = s1.render()

    s2 = RenderSession(width=W, height=H, traversal="brute", options=_OPT)
    s2.set_camera(make_camera("cornell", W, H))
    s2.set_scene(scene)
    s2.load_state(path)
    assert int(s2.state.frame_count) == 3
    next_b = s2.render()

    np.testing.assert_allclose(next_a, next_b, atol=1e-6)
