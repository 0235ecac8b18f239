"""Interactive camera controller.

Host-side reimplementation of the reference's InputSystem fly-camera
(input_system.cpp:49-103 keyboard WASD+QE, :104-148 mouse look): identical
speeds, sensitivity, and the same pitch/yaw rotation construction that
rewrites forward/right/up from a fixed world up.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterable, Optional, Tuple

import numpy as np

MOVEMENT_SPEED = 0.1525  # units per millisecond (input_system.cpp:53)
MOUSE_SENSITIVITY = 0.01525  # degrees per pixel per ms (input_system.cpp:112)


@dataclass
class CameraRig:
    """Mutable pose; converted to/from the jax Camera pytree at the edges."""

    position: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, -3.6]))
    forward: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 1.0]))
    right: np.ndarray = field(default_factory=lambda: np.array([1.0, 0.0, 0.0]))
    up: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0, 0.0]))
    yaw: float = 0.0  # degrees
    pitch: float = 0.0

    @classmethod
    def from_camera(cls, camera) -> "CameraRig":
        rig = cls(
            position=np.asarray(camera.position, np.float64).copy(),
            forward=np.asarray(camera.forward, np.float64).copy(),
            right=np.asarray(camera.right, np.float64).copy(),
            up=np.asarray(camera.up, np.float64).copy(),
        )
        f = rig.forward
        rig.yaw = math.degrees(math.atan2(f[0], f[2]))
        rig.pitch = math.degrees(math.asin(max(-1.0, min(1.0, -f[1]))))
        return rig

    def handle_keys(self, keys: Iterable[str], dt_ms: float):
        """WASD + QE movement, dt in milliseconds (input_system.cpp:49-103)."""
        move = np.zeros(3)
        k = set(keys)
        step = MOVEMENT_SPEED * dt_ms
        if "a" in k:
            move -= self.right * step
        if "d" in k:
            move += self.right * step
        if "s" in k:
            move -= self.forward * step
        if "w" in k:
            move += self.forward * step
        if "q" in k:
            move -= self.up * step
        if "e" in k:
            move += self.up * step
        self.position = self.position + move

    def handle_mouse(self, dx: float, dy: float, dt_ms: float):
        """Left-drag look (input_system.cpp:104-148): accumulate yaw/pitch in
        degrees and rebuild the basis from a fixed world up."""
        self.yaw += dx * MOUSE_SENSITIVITY * dt_ms
        self.pitch += dy * MOUSE_SENSITIVITY * dt_ms
        if abs(self.yaw) >= 360.0:
            self.yaw = 0.0
        if abs(self.pitch) >= 360.0:
            self.pitch = 0.0
        self._rebuild_basis()

    def _rebuild_basis(self):
        """XMMatrixRotationRollPitchYaw applied to +z, then right/up from
        world up — matching input_system.cpp:126-146."""
        cp = math.cos(math.radians(self.pitch))
        sp = math.sin(math.radians(self.pitch))
        cy = math.cos(math.radians(self.yaw))
        sy = math.sin(math.radians(self.yaw))
        # rotation of (0,0,1) by pitch about x then yaw about y
        forward = np.array([sy * cp, -sp, cy * cp])
        forward /= np.linalg.norm(forward)
        world_up = np.array([0.0, 1.0, 0.0])
        # right = normalize(-cross(forward, up))  (left-handed DXMath cross)
        right = -np.cross(forward, world_up)
        n = np.linalg.norm(right)
        if n > 1e-9:
            right /= n
        up = np.cross(forward, right)
        self.forward, self.right, self.up = forward, right, up

    def to_camera(self, focal_length: float, sensor_w: float, aspect: float):
        import jax.numpy as jnp

        from ..ops.camera import Camera

        return Camera(
            position=jnp.asarray(self.position, jnp.float32),
            right=jnp.asarray(self.right, jnp.float32),
            forward=jnp.asarray(self.forward, jnp.float32),
            up=jnp.asarray(self.up, jnp.float32),
            focal_length=jnp.float32(focal_length),
            sensor_size=jnp.array([sensor_w, sensor_w * aspect], jnp.float32),
        )
