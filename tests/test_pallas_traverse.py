"""Packet-traversal Pallas kernel vs the brute-force oracle (interpret mode
off-TPU; the same tests run compiled when CAPSAICIN_TEST_TPU=1)."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import intersect, pallas_traverse as pt
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box


def _rays(rng, n, spread=1.5):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(tris, o, d, tmin=0.0, tmax=1e6):
    packed = pt.build_packed_bvh(tris)
    got = pt.bvh_closest(packed, o, d, tmin, tmax)
    want = intersect.brute_force_closest(o, d, tris, tmin, tmax)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        # tie-breaking may differ when two tris share the hit distance
        gt, wt = np.asarray(got["t"]), np.asarray(want["t"])
        np.testing.assert_allclose(gt[~same], wt[~same], rtol=1e-4)
    hit = (wp >= 0) & same
    np.testing.assert_allclose(np.asarray(got["t"])[hit], np.asarray(want["t"])[hit], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["u"])[hit], np.asarray(want["u"])[hit], atol=1e-5)
    got_any = np.asarray(pt.bvh_any(packed, o, d, max(tmin, 1e-4), tmax))
    want_any = np.asarray(intersect.brute_force_any(o, d, tris, max(tmin, 1e-4), tmax))
    np.testing.assert_array_equal(got_any, want_any)


def test_packet_traversal_cornell(rng):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 1024)
    _check(tris, o, d)


def test_packet_traversal_random_tris(rng):
    base = rng.uniform(-3, 3, size=(100, 1, 3))
    tris = jnp.asarray((base + rng.uniform(-0.5, 0.5, size=(100, 3, 3))).astype(np.float32))
    o, d = _rays(rng, 1024, spread=4.0)
    _check(tris, o, d)


def test_packet_traversal_nonmultiple_rays(rng):
    """Ray counts that don't fill a packet are padded with inert rays."""
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 700)
    _check(tris, o, d)


def test_ray_sort_is_permutation(rng):
    o, d = _rays(rng, 2048)
    order, inverse = pt.sort_rays_for_traversal(o, d)
    order = np.asarray(order)
    inverse = np.asarray(inverse)
    assert sorted(order.tolist()) == list(range(2048))
    np.testing.assert_array_equal(order[inverse], np.arange(2048))


def test_split_tree_set(rng, monkeypatch):
    """Over-cap scenes split into sub-BVHs that merge to the oracle result."""
    from capsaicin_tpu.ops import pallas_traverse as pt2

    monkeypatch.setattr(pt2, "CHUNK_TRIS_CAP", 64)
    base = rng.uniform(-3, 3, size=(200, 1, 3))
    tris = jnp.asarray((base + rng.uniform(-0.5, 0.5, size=(200, 3, 3))).astype(np.float32))
    packed = pt2.build_packed_bvh(tris)
    assert isinstance(packed, pt2.PackedBVHSet)
    assert len(packed.parts) == 4
    o, d = _rays(rng, 512, spread=4.0)
    got = pt2.bvh_closest(packed, o, d)
    want = intersect.brute_force_closest(o, d, tris)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        np.testing.assert_allclose(
            np.asarray(got["t"])[~same], np.asarray(want["t"])[~same], rtol=1e-4
        )
    got_any = np.asarray(pt2.bvh_any(packed, o, d))
    want_any = np.asarray(intersect.brute_force_any(o, d, tris))
    np.testing.assert_array_equal(got_any, want_any)
