"""Camera ray-gen and reprojection invariants."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import camera as cam


def _camera():
    return cam.Camera(
        position=jnp.array([0.0, 1.0, -3.2], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        forward=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
        focal_length=jnp.float32(0.016),
        sensor_size=jnp.array([0.036, 0.036], jnp.float32),
    )


def test_primary_ray_center_points_forward():
    c = _camera()
    xy = jnp.array([[256, 256]], jnp.int32)
    # frame 7 has jitter close to nothing particular; use a frame whose
    # Halton sample is (0.5, 1/3) -> not center. Use explicit math instead:
    o, d = cam.create_primary_rays(c, xy, (512, 512), 0)
    assert o.shape == (1, 3) and d.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(o)[0], [0.0, 1.0, -3.2], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)
    # Analytic formula (camera.h:44-58): Halton frame 0 jitter is (0.5, 1/3)
    cs = ((np.array([256.5, 256 + 1.0 / 3.0]) / 512.0) - 0.5) * 0.036
    want = np.array([cs[0], cs[1], 0.016])
    want /= np.linalg.norm(want)
    np.testing.assert_allclose(np.asarray(d)[0], want, atol=1e-6)
    assert float(d[0, 2]) > 0.99


def test_reproject_roundtrip():
    """uv -> primary ray -> world point -> CalculateImagePlaneUV(same cam) == uv."""
    c = _camera()
    xy = cam.pixel_grid(64, 64).reshape(-1, 2)
    o, d = cam.create_primary_rays(c, xy, (64, 64), 0)
    depth = jnp.full((xy.shape[0],), 5.0)
    p = o + d * depth[:, None]
    uv = np.asarray(cam.calculate_image_plane_uv(c, p))
    jitter = np.asarray(jnp.asarray([0.5, 1.0 / 3.0]))  # Halton frame 0
    expect = (np.asarray(xy, np.float32) + jitter) / 64.0
    np.testing.assert_allclose(uv, expect, atol=2e-4)


def test_reconstruct_world_position_consistency():
    c = _camera()
    uv = jnp.array([[0.5, 0.5], [0.25, 0.75]], jnp.float32)
    depth = jnp.array([4.0, 7.0])
    p = cam.reconstruct_world_position(c, uv, depth)
    # distance from camera equals depth (depth is the ray-distance metric,
    # matching length(cam - p) in rt_direct_lighting.hlsl:82)
    dist = np.linalg.norm(np.asarray(p) - np.asarray(c.position), axis=-1)
    np.testing.assert_allclose(dist, np.asarray(depth), rtol=1e-5)
    # and reprojecting p lands back on uv
    uv2 = np.asarray(cam.calculate_image_plane_uv(c, p))
    np.testing.assert_allclose(uv2, np.asarray(uv), atol=1e-5)


def test_default_camera_matches_reference_values():
    c = cam.default_camera()
    np.testing.assert_allclose(np.asarray(c.position), [0.0, 15.0, 0.0])
    assert abs(float(c.focal_length) - 0.016) < 1e-9
    np.testing.assert_allclose(np.asarray(c.sensor_size), [0.036, 0.036 * 1080.0 / 1920.0])
