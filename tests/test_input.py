"""Fly-camera kinematics vs the reference InputSystem math."""

import numpy as np

from capsaicin_tpu.viewer.input import MOUSE_SENSITIVITY, MOVEMENT_SPEED, CameraRig


def test_wasd_movement_speed():
    rig = CameraRig()
    p0 = rig.position.copy()
    rig.handle_keys({"w"}, dt_ms=16.0)
    # moved along forward by speed * dt (input_system.cpp:53)
    np.testing.assert_allclose(
        rig.position, p0 + rig.forward * MOVEMENT_SPEED * 16.0, atol=1e-9
    )
    rig.handle_keys({"a", "e"}, dt_ms=10.0)
    expect = (
        p0
        + rig.forward * MOVEMENT_SPEED * 16.0
        + (-rig.right + rig.up) * MOVEMENT_SPEED * 10.0
    )
    np.testing.assert_allclose(rig.position, expect, atol=1e-9)


def test_mouse_look_yaw():
    rig = CameraRig()
    # yaw 90 degrees right: forward (0,0,1) -> (1,0,0)
    dx = 90.0 / (MOUSE_SENSITIVITY * 10.0)
    rig.handle_mouse(dx, 0.0, dt_ms=10.0)
    np.testing.assert_allclose(rig.forward, [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(rig.right, [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(rig.up, [0.0, 1.0, 0.0], atol=1e-6)


def test_mouse_look_pitch():
    rig = CameraRig()
    # pitch down 45 degrees (positive dy looks down in screen coords ->
    # pitch+ rotates forward toward -y, matching XMMatrixRotationRollPitchYaw)
    dy = 45.0 / (MOUSE_SENSITIVITY * 10.0)
    rig.handle_mouse(0.0, dy, dt_ms=10.0)
    s = np.sin(np.radians(45))
    np.testing.assert_allclose(rig.forward, [0.0, -s, s], atol=1e-6)
    # basis stays orthonormal
    assert abs(np.dot(rig.forward, rig.right)) < 1e-6
    assert abs(np.dot(rig.forward, rig.up)) < 1e-6
    np.testing.assert_allclose(np.linalg.norm(rig.up), 1.0, atol=1e-6)


def test_yaw_wraps_at_360():
    rig = CameraRig()
    rig.yaw = 359.0
    rig.handle_mouse(2.0 / (MOUSE_SENSITIVITY * 1.0), 0.0, dt_ms=1.0)
    assert rig.yaw == 0.0  # input_system.cpp:117-118 resets at |360|


def test_roundtrip_from_camera():
    from capsaicin_tpu.scene.procedural import make_camera

    cam = make_camera("cornell", 64, 64)
    rig = CameraRig.from_camera(cam)
    cam2 = rig.to_camera(float(np.asarray(cam.focal_length)), 0.036, 1.0)
    np.testing.assert_allclose(np.asarray(cam2.position), np.asarray(cam.position), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam2.forward), np.asarray(cam.forward), atol=1e-6)
