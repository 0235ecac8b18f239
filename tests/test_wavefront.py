"""Wavefront leaf-streaming traversal vs the brute-force oracle.

Pure-XLA backend, so these run compiled on CPU (no interpret mode needed).
Covers: coherent camera-style packets, fully random (mixed-octant) rays —
the conservative interval test must stay correct without sorting — partial
packets, per-ray tmax arrays, and the compacted continuation stages (forced
by shrinking the stage-1 budget).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from capsaicin_tpu.ops import intersect, wavefront as wf
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box


def _rays(rng, n, spread=1.5):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(tris, o, d, tmin=0.0, tmax=1e6):
    bvh = wf.build_wavefront_bvh(tris)
    got = wf.wavefront_closest(bvh, o, d, tmin, tmax)
    want = intersect.brute_force_closest(o, d, tris, tmin, tmax)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        # tie-breaking may differ when two tris share the hit distance
        gt, wt = np.asarray(got["t"]), np.asarray(want["t"])
        np.testing.assert_allclose(gt[~same], wt[~same], rtol=1e-4)
    hit = (wp >= 0) & same
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(want["t"])[hit], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["u"])[hit], np.asarray(want["u"])[hit], atol=1e-5
    )
    miss = wp < 0
    assert np.all(np.asarray(got["t"])[miss & same] >= 1e29)
    got_any = np.asarray(wf.wavefront_any(bvh, o, d, max(np.max(tmin), 1e-4), tmax))
    want_any = np.asarray(
        intersect.brute_force_any(o, d, tris, max(np.max(tmin), 1e-4), tmax)
    )
    np.testing.assert_array_equal(got_any, want_any)


def test_wavefront_cornell_random_rays(rng):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 1024)
    _check(tris, o, d)


def test_wavefront_random_tris_mixed_octants(rng):
    base = rng.uniform(-3, 3, size=(300, 1, 3))
    tris = jnp.asarray(
        (base + rng.uniform(-0.5, 0.5, size=(300, 3, 3))).astype(np.float32)
    )
    o, d = _rays(rng, 1024, spread=4.0)
    _check(tris, o, d)


def test_wavefront_partial_packet(rng):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 300)
    _check(tris, o, d)


def test_wavefront_per_ray_tmax(rng):
    """Array tmin/tmax incl. dead rays (tmax < tmin) must report no hit."""
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 512)
    tmax = jnp.asarray(rng.uniform(0.5, 6.0, size=512).astype(np.float32))
    tmax = tmax.at[::7].set(-1.0)  # dead lanes
    bvh = wf.build_wavefront_bvh(tris)
    got = wf.wavefront_closest(bvh, o, d, 0.0, tmax)
    want = intersect.brute_force_closest(o, d, tris, 0.0, tmax)
    np.testing.assert_array_equal(
        np.asarray(got["prim"]), np.asarray(want["prim"])
    )
    assert np.all(np.asarray(got["prim"])[::7] == -1)
    got_any = np.asarray(wf.wavefront_any(bvh, o, d, 1e-4, tmax))
    want_any = np.asarray(intersect.brute_force_any(o, d, tris, 1e-4, tmax))
    np.testing.assert_array_equal(got_any, want_any)


def test_wavefront_continuation_stages(rng, monkeypatch):
    """A tiny stage-1 budget forces the in-graph compacted stage loop; the
    result must not change."""
    monkeypatch.setattr(wf, "K_STAGE1", 4)
    monkeypatch.setattr(wf, "K_STAGE2", 6)
    base = rng.uniform(-3, 3, size=(300, 1, 3))
    tris = jnp.asarray(
        (base + rng.uniform(-0.5, 0.5, size=(300, 3, 3))).astype(np.float32)
    )
    o, d = _rays(rng, 640, spread=4.0)
    _check(tris, o, d)
