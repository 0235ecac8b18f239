"""The sorted-trace wrappers must be EXACTLY result-equal to the unwrapped
traversal (they are pure permutations). Guards the packed-permute path that
once shipped a prim-id corruption (int32 bit patterns do not survive the
float pipeline: denormal flush + NaN canonicalization)."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import intersect
from capsaicin_tpu.render.traversal import with_ray_sorting, with_ray_sorting_any
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box


def _rays(rng, n):
    o = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_sorted_wrappers_equal_unwrapped(rng):
    scene = build_scene(cornell_box())
    tris = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2], axis=1)

    def closest(o, d, tmin, tmax):
        return intersect.brute_force_closest(o, d, tris, tmin, tmax)

    def any_hit(o, d, tmin, tmax):
        return intersect.brute_force_any(o, d, tris, tmin, tmax)

    o, d = _rays(rng, 700)
    # include retired lanes (per-ray tmax < tmin) like the dead-lane path
    tmax = jnp.where(jnp.arange(700) % 3 == 0, -1.0, 1e5)

    want = closest(o, d, 1e-4, tmax)
    got = with_ray_sorting(closest)(o, d, 1e-4, tmax)
    for k in ("t", "u", "v"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]), atol=0)
    np.testing.assert_array_equal(np.asarray(got["prim"]), np.asarray(want["prim"]))

    want_any = any_hit(o, d, 1e-4, tmax)
    got_any = with_ray_sorting_any(any_hit)(o, d, 1e-4, tmax)
    np.testing.assert_array_equal(np.asarray(got_any), np.asarray(want_any))


def test_sorted_wrappers_dir_grid_equal(rng):
    """dir_grid (finer 6*N^2 direction binning) is a pure permutation too:
    wrapper results must equal the unwrapped trace exactly."""
    scene = build_scene(cornell_box())
    tris = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2], axis=1)

    def closest(o, d, tmin, tmax):
        return intersect.brute_force_closest(o, d, tris, tmin, tmax)

    def any_hit(o, d, tmin, tmax):
        return intersect.brute_force_any(o, d, tris, tmin, tmax)

    o, d = _rays(rng, 700)
    tmax = jnp.where(jnp.arange(700) % 5 == 0, -1.0, 1e5)

    want = closest(o, d, 1e-4, tmax)
    got = with_ray_sorting(closest, dir_grid=4)(o, d, 1e-4, tmax)
    for k in ("t", "u", "v"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=0)
    np.testing.assert_array_equal(np.asarray(got["prim"]),
                                  np.asarray(want["prim"]))
    want_any = any_hit(o, d, 1e-4, tmax)
    got_any = with_ray_sorting_any(any_hit, dir_grid=4)(o, d, 1e-4, tmax)
    np.testing.assert_array_equal(np.asarray(got_any), np.asarray(want_any))


def test_dir_grid_sort_is_permutation(rng):
    from capsaicin_tpu.ops.pallas_traverse import sort_rays_for_traversal

    o, d = _rays(rng, 999)
    dead = jnp.asarray(np.arange(999) % 7 == 0)
    for g in (0, 2, 4):
        order, inverse = sort_rays_for_traversal(o, d, dead=dead, dir_grid=g)
        on = np.asarray(order)
        assert sorted(on.tolist()) == list(range(999))
        np.testing.assert_array_equal(on[np.asarray(inverse)],
                                      np.arange(999))
        # dead rays sort last
        n_dead = int(np.asarray(dead).sum())
        assert np.asarray(dead)[on[-n_dead:]].all()
