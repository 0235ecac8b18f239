"""Pallas intersector vs the jnp oracle (interpret mode off-TPU)."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import intersect, pallas_intersect as pi


def test_pallas_matches_oracle(rng):
    base = rng.uniform(-2, 2, size=(150, 1, 3))
    tris = jnp.asarray((base + rng.uniform(-0.5, 0.5, size=(150, 3, 3))).astype(np.float32))
    n = 700
    o = jnp.asarray(rng.uniform(-3, 3, size=(n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    got = pi.brute_force_closest(o, d, tris)
    want = intersect.brute_force_closest(o, d, tris)
    np.testing.assert_array_equal(np.asarray(got["prim"]), np.asarray(want["prim"]))
    hit = np.asarray(want["prim"]) >= 0
    np.testing.assert_allclose(
        np.asarray(got["t"])[hit], np.asarray(want["t"])[hit], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["u"])[hit], np.asarray(want["u"])[hit], atol=1e-5
    )

    got_any = pi.brute_force_any(o, d, tris)
    want_any = intersect.brute_force_any(o, d, tris)
    np.testing.assert_array_equal(np.asarray(got_any), np.asarray(want_any))


def test_pallas_respects_tmin_tmax(rng):
    tris = jnp.asarray(
        np.array([[[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0]]], np.float32)
    )
    o = jnp.zeros((4, 3))
    d = jnp.asarray(np.array([[0, 0, 1]] * 4, np.float32))
    out = pi.brute_force_closest(o, d, tris, tmin=0.0, tmax=10.0)
    assert np.all(np.asarray(out["prim"]) == 0)
    out = pi.brute_force_closest(o, d, tris, tmin=3.0, tmax=10.0)
    assert np.all(np.asarray(out["prim"]) == -1)
    out = pi.brute_force_closest(o, d, tris, tmin=0.0, tmax=1.0)
    assert np.all(np.asarray(out["prim"]) == -1)
