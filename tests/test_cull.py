"""Dense-cull traversal (ops/cull.py) vs the brute-force oracle.

Pure-XLA backend, so these run compiled on CPU. Covers both test modes
(coherent packet-interval and incoherent per-ray), mixed-octant random
rays, partial packets, dead rays (tmax < tmin), per-ray tmax arrays, tiny
scenes (start level == row level), and the budget fallbacks: shrinking
budget/k_rows forces the 4x compacted retrace and the rescue sweep.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from capsaicin_tpu.ops import cull, intersect
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import colonnade, cornell_box


def _rays(rng, n, spread=1.5):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(tris, o, d, tmin=0.0, tmax=1e6, coherent=True, **kw):
    bvh = cull.build_cull_bvh(tris)
    got = cull.cull_closest(bvh, o, d, tmin, tmax, coherent=coherent, **kw)
    want = intersect.brute_force_closest(o, d, tris, tmin, tmax)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        # tie-breaking may differ when two tris share the hit distance
        gt, wt = np.asarray(got["t"]), np.asarray(want["t"])
        np.testing.assert_allclose(gt[~same], wt[~same], rtol=1e-4)
    hit = (wp >= 0) & same
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(want["t"])[hit], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["u"])[hit], np.asarray(want["u"])[hit], atol=1e-5)
    miss = wp < 0
    assert np.all(np.asarray(got["t"])[miss & same] >= 1e29)
    amin = max(np.max(tmin), 1e-4)
    got_any = np.asarray(
        cull.cull_any(bvh, o, d, amin, tmax, coherent=coherent, **kw))
    want_any = np.asarray(intersect.brute_force_any(o, d, tris, amin, tmax))
    np.testing.assert_array_equal(got_any, want_any)


@pytest.mark.parametrize("coherent", [True, False])
def test_cull_cornell_random_rays(rng, coherent):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 513)  # partial last packet
    _check(tris, o, d, coherent=coherent)


@pytest.mark.parametrize("coherent", [True, False])
def test_cull_random_tris_mixed_octants(rng, coherent):
    base = rng.uniform(-3, 3, size=(300, 1, 3))
    tris = jnp.asarray(
        (base + rng.normal(scale=0.4, size=(300, 3, 3))).astype(np.float32))
    o, d = _rays(rng, 1024, spread=3.5)
    _check(tris, o, d, coherent=coherent)


def test_cull_dense_scene_camera_rays(rng):
    """Colonnade slice with camera-style rays: deep tree, coherent path."""
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene.procedural import make_camera

    scene = build_scene(colonnade(target_tris=6000))
    tris = jnp.asarray(scene.triangles())
    cam = make_camera("colonnade", 64, 64)
    o, d = create_primary_rays(cam, pixel_grid(64, 64), (64, 64), 0)
    _check(tris, o.reshape(-1, 3), d.reshape(-1, 3))


def test_cull_dense_scene_incoherent(rng):
    scene = build_scene(colonnade(target_tris=6000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 512, spread=6.0)
    _check(tris, o, d, coherent=False)


@pytest.mark.parametrize("coherent", [True, False])
def test_cull_forced_overflow_budgets(rng, coherent):
    """Tiny budgets force the 4x retrace AND the rescue sweep; results must
    stay exact."""
    scene = build_scene(colonnade(target_tris=3000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 256, spread=5.0)
    _check(tris, o, d, coherent=coherent, budget=2, k_rows=4)


def test_cull_dead_rays_and_per_ray_tmax(rng):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 256)
    tmax = rng.uniform(0.5, 4.0, size=256).astype(np.float32)
    tmax[::5] = -1.0  # dead rays
    _check(tris, o, d, tmin=0.0, tmax=jnp.asarray(tmax))
    _check(tris, o, d, tmin=0.0, tmax=jnp.asarray(tmax), coherent=False)


def test_cull_tiny_scene_start_is_rows(rng):
    """A handful of triangles: depth < start level, so stage 1 tests the
    leaf rows directly."""
    tris = jnp.asarray(
        rng.normal(scale=1.0, size=(20, 3, 3)).astype(np.float32))
    o, d = _rays(rng, 130)
    _check(tris, o, d)
    _check(tris, o, d, coherent=False)
