"""Physical pinhole camera: primary ray generation and reprojection.

TPU-native reimplementation of /root/reference/src/core/shaders/camera.h and
the host-side CameraData struct (camera_system.h:16-31, defaults at
camera_system.cpp:25-33). The camera is a pytree dataclass; ray generation is
vectorized over the full pixel grid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from . import mathops as m
from . import sampling


class Camera(NamedTuple):
    """Pytree camera; mirrors CameraData (data_payload.h:7-19)."""

    position: jnp.ndarray  # [3]
    right: jnp.ndarray  # [3]
    forward: jnp.ndarray  # [3]
    up: jnp.ndarray  # [3]
    focal_length: jnp.ndarray  # scalar
    sensor_size: jnp.ndarray  # [2] (width, height) in meters
    # NumPy defaults on purpose: jnp defaults would run at class-definition
    # (package-import) time and initialize the device backend — hanging
    # `import capsaicin_tpu` whenever the TPU tunnel is unreachable.
    znear: jnp.ndarray = np.float32(0.0)
    focus_distance: jnp.ndarray = np.float32(0.0)
    aperture: jnp.ndarray = np.float32(0.0)


def default_camera(aspect: float = 1080.0 / 1920.0) -> Camera:
    """Defaults from camera_system.cpp:25-33 + aspect fit (camera_system.cpp:10-17)."""
    return Camera(
        position=jnp.array([0.0, 15.0, 0.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        forward=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        focal_length=jnp.float32(0.016),
        sensor_size=jnp.array([0.036, 0.036 * aspect], jnp.float32),
    )


def pixel_grid(width: int, height: int):
    """Integer pixel coordinates [H,W,2] = (x, y)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return jnp.stack([xs, ys], axis=-1)


def create_primary_rays(camera: Camera, xy, dims, frame_count):
    """Primary rays for pixels xy; camera.h:39-63.

    xy: [...,2] int pixel coords; dims: (W, H) ints.
    Returns (origin [...,3], direction [...,3]).
    """
    s = sampling.sample2d_halton23(frame_count)
    dim = jnp.asarray(dims, jnp.float32)
    img_sample = (xy.astype(jnp.float32) + s) / dim
    h_sample = img_sample - 0.5
    c_sample = h_sample * camera.sensor_size
    direction = m.normalize(
        camera.focal_length * camera.forward
        + c_sample[..., 0:1] * camera.right
        + c_sample[..., 1:2] * camera.up
    )
    origin = jnp.broadcast_to(camera.position, direction.shape)
    return origin, direction


def calculate_image_plane_uv(camera: Camera, position):
    """Project world position onto the image plane -> uv in [0,1]; camera.h:8-37."""
    d = m.normalize(position - camera.position)
    n = m.normalize(camera.forward)
    p = camera.position + n * camera.focal_length
    t = m.dot(jnp.broadcast_to(n, d.shape), p - camera.position) / m.dot(
        jnp.broadcast_to(n, d.shape), d
    )
    ip = camera.position + t[..., None] * d
    ipd = ip - p
    u = m.dot(ipd, jnp.broadcast_to(camera.right, ipd.shape)) / (0.5 * camera.sensor_size[0])
    v = m.dot(ipd, jnp.broadcast_to(camera.up, ipd.shape)) / (0.5 * camera.sensor_size[1])
    return 0.5 * jnp.stack([u, v], axis=-1) + 0.5


def reconstruct_world_position(camera: Camera, uv, depth):
    """uv in [0,1] + camera-distance depth -> world position; camera.h:65-80."""
    h_sample = uv - 0.5
    c_sample = h_sample * camera.sensor_size
    d = m.normalize(
        camera.focal_length * camera.forward
        + c_sample[..., 0:1] * camera.right
        + c_sample[..., 1:2] * camera.up
    )
    return camera.position + depth[..., None] * d
