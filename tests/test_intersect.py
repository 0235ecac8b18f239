"""Brute-force intersector (the oracle) vs a scalar NumPy reference."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import intersect


def _numpy_closest(o, d, tris, tmin=0.0, tmax=1e6):
    best_t, best_u, best_v, best_p = 1e30, 0.0, 0.0, -1
    for k, (v0, v1, v2) in enumerate(tris):
        e1, e2 = v1 - v0, v2 - v0
        pvec = np.cross(d, e2)
        det = e1 @ pvec
        if abs(det) < 1e-12:
            continue
        inv = 1.0 / det
        tvec = o - v0
        u = (tvec @ pvec) * inv
        if u < 0 or u > 1:
            continue
        qvec = np.cross(tvec, e1)
        v = (d @ qvec) * inv
        if v < 0 or u + v > 1:
            continue
        t = (e2 @ qvec) * inv
        if tmin < t < tmax and t < best_t:
            best_t, best_u, best_v, best_p = t, u, v, k
    return best_t, best_u, best_v, best_p


def _random_tris(rng, n):
    base = rng.uniform(-2, 2, size=(n, 1, 3))
    return (base + rng.uniform(-0.7, 0.7, size=(n, 3, 3))).astype(np.float32)


def test_closest_matches_numpy(rng):
    tris = _random_tris(rng, 50)
    origins = rng.uniform(-3, 3, size=(40, 3)).astype(np.float32)
    dirs = rng.normal(size=(40, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    out = intersect.brute_force_closest(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(tris), tri_block=16
    )
    prim = np.asarray(out["prim"])
    t = np.asarray(out["t"])
    u = np.asarray(out["u"])
    v = np.asarray(out["v"])
    for i in range(40):
        bt, bu, bv, bp = _numpy_closest(origins[i], dirs[i], tris)
        assert prim[i] == bp, f"ray {i}"
        if bp >= 0:
            assert abs(t[i] - bt) < 1e-3
            assert abs(u[i] - bu) < 1e-4
            assert abs(v[i] - bv) < 1e-4


def test_any_hit_matches_closest(rng):
    tris = _random_tris(rng, 33)
    origins = rng.uniform(-3, 3, size=(64, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    closest = intersect.brute_force_closest(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(tris), tmin=1e-4
    )
    any_hit = intersect.brute_force_any(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(tris), tmin=1e-4
    )
    np.testing.assert_array_equal(np.asarray(any_hit), np.asarray(closest["prim"]) >= 0)


def test_barycentric_convention():
    """Hit point must reconstruct as (1-u-v) v0 + u v1 + v v2 (scene.h:47-49)."""
    tri = np.array([[[0.0, 0.0, 5.0], [2.0, 0.0, 5.0], [0.0, 2.0, 5.0]]], np.float32)
    o = jnp.array([[0.5, 0.25, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = intersect.brute_force_closest(o, d, jnp.asarray(tri))
    u, v = float(out["u"][0]), float(out["v"][0])
    p = (1 - u - v) * tri[0, 0] + u * tri[0, 1] + v * tri[0, 2]
    np.testing.assert_allclose(p, [0.5, 0.25, 5.0], atol=1e-5)


def test_tmin_respected():
    tri = np.array([[[-1, -1, 1.0], [1, -1, 1.0], [0, 1, 1.0]]], np.float32)
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect.brute_force_any(o, d, jnp.asarray(tri), tmin=2.0)
    assert not bool(hit[0])
    hit = intersect.brute_force_any(o, d, jnp.asarray(tri), tmin=0.5)
    assert bool(hit[0])
