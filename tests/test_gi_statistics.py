"""Statistical tests for the Monte Carlo GI estimator.

The cleanest invariant of the reference's estimator structure
(rt_indirect.hlsl:91-174): at bounce 0 the throughput update is
brdf*cos/pdf = (1/pi * cos)/(cos/pi) = 1 and kd is NOT applied (the first
hit's albedo is multiplied in later by the combine pass). So for a flat
ground plane under the constant sky, every bounce-0 sample escapes and the
raw indirect output equals the sky color EXACTLY per pixel — the estimator
has zero variance there. Any deviation flags a broken throughput/pdf chain.
"""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops.camera import Camera
from capsaicin_tpu.render import passes
from capsaicin_tpu.render.settings import RenderOptions
from capsaicin_tpu.render.traversal import make_brute_force
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.obj_loader import Material, MeshData
from capsaicin_tpu.scene.procedural import _quad, cornell_box, make_camera
from capsaicin_tpu.scene import textures

W = H = 32
SKY = np.array([0.7, 0.7, 0.85])


def _plane_scene():
    mesh = MeshData(name="ground")
    mesh.material = Material("gray", kd=(0.5, 0.5, 0.5))
    _quad(mesh, (-50, 0, -50), (50, 0, -50), (50, 0, 50), (-50, 0, 50), (0, 1, 0))
    return build_scene([mesh])


def _camera_above():
    return Camera(
        position=jnp.array([0.0, 5.0, 0.0], jnp.float32),
        right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
        forward=jnp.array([0.0, -1.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 0.0, 1.0], jnp.float32),
        focal_length=jnp.float32(0.035),
        sensor_size=jnp.array([0.036, 0.036], jnp.float32),
    )


def _run_indirect(scene, camera, options, frame_count=0):
    closest, any_hit = make_brute_force(scene)
    noise = jnp.asarray(textures.blue_noise_256())
    gb = passes.trace_primary(closest, camera, W, H, frame_count)
    prev_nd = {
        "oct": jnp.zeros((H, W, 2)),
        "inst": jnp.full((H, W), -1, jnp.int32),
        "depth": jnp.zeros((H, W)),
    }
    indirect = passes.indirect_gi(
        scene, closest, any_hit, camera, camera, gb,
        jnp.zeros((H, W, 3)), prev_nd, noise, W, H, frame_count, options,
    )
    return np.asarray(indirect), np.asarray(gb["prim"])


def test_plane_indirect_equals_sky_exactly():
    """Flat plane, 1 bounce: every sample escapes to the sky with unit
    throughput -> raw indirect == sky, zero variance."""
    scene = _plane_scene()
    camera = _camera_above()
    options = RenderOptions(num_diffuse_bounces=1, gbuffer_feedback=False)
    indirect, prim = _run_indirect(scene, camera, options)
    assert (prim >= 0).all(), "camera should see only the plane"
    np.testing.assert_allclose(indirect, np.broadcast_to(SKY, indirect.shape), atol=1e-5)


def test_plane_two_bounces_still_sky():
    """With more bounces the path still escapes on the first bounce."""
    scene = _plane_scene()
    camera = _camera_above()
    options = RenderOptions(num_diffuse_bounces=3, gbuffer_feedback=False)
    indirect, _ = _run_indirect(scene, camera, options)
    np.testing.assert_allclose(indirect, np.broadcast_to(SKY, indirect.shape), atol=1e-5)


def test_zero_bounces_is_black():
    """num_diffuse_bounces=0: loop runs bounce 0 only — no NEE (bounce 0
    skips it) and the final trace is dead -> indirect is exactly 0."""
    scene = _plane_scene()
    camera = _camera_above()
    options = RenderOptions(num_diffuse_bounces=0, gbuffer_feedback=False)
    indirect, _ = _run_indirect(scene, camera, options)
    np.testing.assert_allclose(indirect, 0.0, atol=1e-7)


def test_cornell_gi_bounded_and_nonzero():
    """Inside the Cornell box GI must be positive (skylight + sky leakage)
    and bounded by the sky + direct light energy."""
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    options = RenderOptions(num_diffuse_bounces=1, gbuffer_feedback=False)
    acc = None
    for f in range(8):
        indirect, prim = _run_indirect(scene, camera, options, frame_count=f)
        acc = indirect if acc is None else acc + indirect
    mean_gi = (acc / 8)[prim >= 0].mean()
    assert 1e-3 < mean_gi < 30.0
