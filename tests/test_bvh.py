"""LBVH build invariants + traversal equality vs the brute-force oracle."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import intersect, lbvh, traverse
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import colonnade, cornell_box


def _random_tris(rng, n, spread=4.0):
    base = rng.uniform(-spread, spread, size=(n, 1, 3))
    return (base + rng.uniform(-0.4, 0.4, size=(n, 3, 3))).astype(np.float32)


def _random_rays(rng, n, spread=6.0):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_invariants(rng):
    tris = _random_tris(rng, 1000)
    bvh = lbvh.build_lbvh(jnp.asarray(tris), leaf_size=4)
    n_leaves = bvh.n_leaves
    assert n_leaves * bvh.leaf_size >= 1000
    # every real triangle appears exactly once
    ids = np.asarray(bvh.tri_id)
    real = ids[ids >= 0]
    assert sorted(real.tolist()) == list(range(1000))
    # parent boxes contain child boxes
    mins = np.asarray(bvh.nodes_min)
    maxs = np.asarray(bvh.nodes_max)
    for k in range(1, n_leaves):
        for c in (2 * k, 2 * k + 1):
            valid = mins[c, 0] <= maxs[c, 0]  # skip empty (padding) boxes
            if valid:
                assert np.all(mins[k] <= mins[c] + 1e-6)
                assert np.all(maxs[k] >= maxs[c] - 1e-6)
    # leaf boxes contain their triangles
    sv0 = np.asarray(bvh.tri_v0)
    se1 = np.asarray(bvh.tri_e1)
    se2 = np.asarray(bvh.tri_e2)
    for leaf in range(0, n_leaves, 37):
        k = n_leaves + leaf
        for j in range(bvh.leaf_size):
            s = leaf * bvh.leaf_size + j
            if ids[s] < 0:
                continue
            for vtx in (sv0[s], sv0[s] + se1[s], sv0[s] + se2[s]):
                assert np.all(vtx >= mins[k] - 1e-5)
                assert np.all(vtx <= maxs[k] + 1e-5)


def test_dfs_next_enumerates_tree():
    """The arithmetic skip function must realize a full DFS of the heap."""
    import jax

    depth = 4
    n_leaves = 1 << depth
    visited = []
    k = 1
    for _ in range(4 * n_leaves):
        visited.append(k)
        # always descend on internal, skip on leaf (visits every node once)
        if k < n_leaves:
            k = 2 * k
        else:
            k = int(traverse._dfs_next(jnp.asarray([k], jnp.int32))[0])
            if k <= 1:
                break
    assert sorted(visited) == list(range(1, 2 * n_leaves))


def _check_equal(tris, origins, dirs, tmin=0.0, tmax=1e6, leaf_size=4):
    bvh = lbvh.build_lbvh(jnp.asarray(tris), leaf_size=leaf_size)
    got = traverse.bvh_closest(bvh, origins, dirs, tmin, tmax)
    want = intersect.brute_force_closest(origins, dirs, jnp.asarray(tris), tmin, tmax)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    # allow tie-breaking differences when two triangles share the same t
    same = gp == wp
    if not same.all():
        gt, wt = np.asarray(got["t"]), np.asarray(want["t"])
        np.testing.assert_allclose(gt[~same], wt[~same], rtol=1e-4)
    hit = wp >= 0
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit & same], np.asarray(want["t"])[hit & same], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["u"])[hit & same], np.asarray(want["u"])[hit & same], atol=1e-5
    )
    # any-hit agreement
    got_any = np.asarray(traverse.bvh_any(bvh, origins, dirs, max(tmin, 1e-4), tmax))
    want_any = np.asarray(
        intersect.brute_force_any(origins, dirs, jnp.asarray(tris), max(tmin, 1e-4), tmax)
    )
    np.testing.assert_array_equal(got_any, want_any)


def test_traversal_equals_brute_force_random(rng):
    tris = _random_tris(rng, 700)
    o, d = _random_rays(rng, 500)
    _check_equal(tris, o, d)


def test_traversal_equals_brute_force_cornell(rng):
    scene = build_scene(cornell_box())
    tris = scene.triangles()
    o, d = _random_rays(rng, 400, spread=1.5)
    _check_equal(tris, o, d, leaf_size=2)


def test_traversal_nonpow2_and_leaf_sizes(rng):
    for n, ls in ((17, 1), (33, 4), (100, 8)):
        tris = _random_tris(rng, n)
        o, d = _random_rays(rng, 100)
        _check_equal(tris, o, d, leaf_size=ls)


def test_traversal_medium_scene(rng):
    scene = build_scene(colonnade(target_tris=8000))
    tris = scene.triangles()
    o = np.zeros((256, 3), np.float32) + np.array([0, 3, 0], np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _check_equal(tris, jnp.asarray(o), jnp.asarray(d), leaf_size=4)
