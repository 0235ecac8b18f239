"""DMA-streaming traversal (ops/stream.py) vs the brute-force oracle.

Runs in Pallas interpret mode on CPU. Covers coherent camera rays over a
dense scene, mixed-octant random rays, partial gangs, dead rays
(tmax < tmin), per-ray tmax arrays, tiny scenes (fewer blocks than lanes),
non-power-of-two scenes (padding-block validity), and both block sizes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from capsaicin_tpu.ops import intersect, stream
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import colonnade, cornell_box


def _rays(rng, n, spread=1.5):
    o = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(tris, o, d, tmin=0.0, tmax=1e6, block_tris=stream.BLOCK_TRIS):
    sbvh = stream.build_stream_bvh(tris, block_tris=block_tris)
    got = stream.stream_closest(sbvh, o, d, tmin, tmax)
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
    got_any = np.asarray(stream.stream_any(sbvh, o, d, amin, tmax))
    want_any = np.asarray(intersect.brute_force_any(o, d, tris, amin, tmax))
    np.testing.assert_array_equal(got_any, want_any)


def test_stream_cornell_random_rays(rng):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 513)  # partial last gang
    _check(tris, o, d)


def test_stream_random_tris_mixed_octants(rng):
    base = rng.uniform(-3, 3, size=(300, 1, 3))
    tris = jnp.asarray(
        (base + rng.normal(scale=0.4, size=(300, 3, 3))).astype(np.float32))
    o, d = _rays(rng, 1024, spread=3.5)
    _check(tris, o, d)


def test_stream_dense_scene_camera_rays(rng):
    """Colonnade slice with camera-style rays: the production path shape
    (deep tree, many blocks, coherent sub-packets)."""
    from capsaicin_tpu.ops.camera import create_primary_rays, pixel_grid
    from capsaicin_tpu.scene.procedural import make_camera

    scene = build_scene(colonnade(target_tris=6000))
    tris = jnp.asarray(scene.triangles())
    cam = make_camera("colonnade", 64, 64)
    o, d = create_primary_rays(cam, pixel_grid(64, 64), (64, 64), 0)
    _check(tris, o.reshape(-1, 3), d.reshape(-1, 3))


def test_stream_dense_scene_incoherent(rng):
    scene = build_scene(colonnade(target_tris=6000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 700, spread=6.0)
    _check(tris, o, d)


def test_stream_nonpow2_blocks_validity(rng):
    """Triangle counts that leave padding blocks: their inverted boxes must
    not emit phantom candidates (validity row 6)."""
    for t_count in (37, 130, 257):
        base = rng.uniform(-2, 2, size=(t_count, 1, 3))
        tris = jnp.asarray(
            (base + rng.normal(scale=0.3, size=(t_count, 3, 3))
             ).astype(np.float32))
        o, d = _rays(rng, 256, spread=2.5)
        _check(tris, o, d)


def test_stream_extraction_order_equal(rng):
    """near_first extraction must be a pure perf knob: identical results
    to index-order extraction on a dense scene."""
    scene = build_scene(colonnade(target_tris=4000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 640, spread=5.0)
    sbvh = stream.build_stream_bvh(tris)
    a = stream.stream_closest(sbvh, o, d, near_first=True)
    b = stream.stream_closest(sbvh, o, d, near_first=False)
    same = np.asarray(a["prim"]) == np.asarray(b["prim"])
    if not same.all():  # equal-t tie between two prims
        np.testing.assert_allclose(
            np.asarray(a["t"])[~same], np.asarray(b["t"])[~same], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(stream.stream_any(sbvh, o, d, near_first=True)),
        np.asarray(stream.stream_any(sbvh, o, d, near_first=False)))


def test_stream_hier_equals_flat(rng):
    """Hierarchical (two-level) extraction must be a pure perf knob:
    identical pops in the same (tnear, id) order as the flat full-width
    scan, so bit-identical results on a dense scene."""
    scene = build_scene(colonnade(target_tris=4000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 640, spread=5.0)
    sbvh = stream.build_stream_bvh(tris)
    a = stream.stream_closest(sbvh, o, d, hier=True)
    b = stream.stream_closest(sbvh, o, d, hier=False)
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    np.testing.assert_array_equal(
        np.asarray(stream.stream_any(sbvh, o, d, hier=True)),
        np.asarray(stream.stream_any(sbvh, o, d, hier=False)))


def test_stream_balance_equals_unbalanced(rng):
    """The candidate-count load-balance pre-pass permutes whole sub-packets
    into equal-work gangs; sub-packets are independent in the kernel, so
    results must be bit-identical, including dead lanes."""
    scene = build_scene(colonnade(target_tris=4000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 8 * 1024 + 200, spread=5.0)  # several gangs + partial
    n = o.shape[0]
    tmax = jnp.where(jnp.arange(n) % 9 == 0, -1.0, 1e6)
    sbvh = stream.build_stream_bvh(tris)
    a = stream.stream_closest(sbvh, o, d, 0.0, tmax, balance=True)
    b = stream.stream_closest(sbvh, o, d, 0.0, tmax, balance=False)
    for k in ("t", "u", "v", "prim"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    np.testing.assert_array_equal(
        np.asarray(stream.stream_any(sbvh, o, d, 1e-4, tmax, balance=True)),
        np.asarray(stream.stream_any(sbvh, o, d, 1e-4, tmax, balance=False)))


def test_stream_session_bounce_balanced_frame():
    """Full session frame in stream mode (bounce fns use dir_grid sorting +
    balancing) equals the bvh-backend frame."""
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene.procedural import make_camera

    scene = build_scene(colonnade(target_tris=3000))
    opts = RenderOptions(taa=False, eaw5=False, num_diffuse_bounces=2)
    imgs = {}
    for mode in ("stream", "bvh"):
        s = RenderSession(width=32, height=32, options=opts, traversal=mode)
        s.set_camera(make_camera("colonnade", 32, 32))
        s.set_scene(scene)
        imgs[mode] = s.render()
    assert np.all(np.isfinite(imgs["stream"]))
    np.testing.assert_allclose(imgs["stream"], imgs["bvh"], atol=2e-5)


def test_stream_tiny_scene(rng):
    tris = jnp.asarray(rng.normal(size=(5, 3, 3)).astype(np.float32))
    o, d = _rays(rng, 130)
    _check(tris, o, d)


def test_stream_many_groups(rng):
    """>128 block groups (the hier group-min table spans multiple lane
    tiles): small blocks force n_grp=256 without a huge scene."""
    base = rng.uniform(-4, 4, size=(135000, 1, 3))
    tris = jnp.asarray(
        (base + rng.normal(scale=0.05, size=(135000, 3, 3))
         ).astype(np.float32))
    sbvh = stream.build_stream_bvh(tris, block_tris=8)
    assert sbvh.boxes.shape[1] // 128 > 128  # gp spans >1 lane tile
    o, d = _rays(rng, 128, spread=4.5)
    got = stream.stream_closest(sbvh, o, d)
    want = intersect.brute_force_closest(o, d, tris, 0.0, 1e6)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        np.testing.assert_allclose(
            np.asarray(got["t"])[~same], np.asarray(want["t"])[~same],
            rtol=1e-4)


def test_stream_block64(rng):
    scene = build_scene(colonnade(target_tris=4000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 512, spread=5.0)
    _check(tris, o, d, block_tris=64)


def test_stream_dead_rays_and_tmax_array(rng):
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 384)
    tmax = jnp.asarray(
        rng.uniform(0.5, 4.0, size=(384,)).astype(np.float32))
    tmax = tmax.at[::7].set(-1.0)  # dead rays: tmax < tmin
    sbvh = stream.build_stream_bvh(tris)
    got = stream.stream_closest(sbvh, o, d, 0.0, tmax)
    want = intersect.brute_force_closest(o, d, tris, 0.0, tmax)
    gp, wp = np.asarray(got["prim"]), np.asarray(want["prim"])
    same = gp == wp
    if not same.all():
        np.testing.assert_allclose(
            np.asarray(got["t"])[~same], np.asarray(want["t"])[~same],
            rtol=1e-4)
    got_any = np.asarray(stream.stream_any(sbvh, o, d, 1e-4, tmax))
    want_any = np.asarray(intersect.brute_force_any(o, d, tris, 1e-4, tmax))
    np.testing.assert_array_equal(got_any, want_any)


def test_stream_all_dead_gang(rng):
    """A gang whose every ray is dead must terminate without candidates."""
    scene = build_scene(cornell_box())
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 128)
    sbvh = stream.build_stream_bvh(tris)
    got = stream.stream_closest(sbvh, o, d, 0.0, -1.0)
    assert np.all(np.asarray(got["prim"]) == -1)
    assert not np.any(np.asarray(stream.stream_any(sbvh, o, d, 1e-4, -1.0)))


def test_stream_session_frame_matches_bvh():
    """Full-pipeline session frame with traversal='stream' equals the bvh
    backend frame (integration through make_traversal, block ordering,
    and the bounce-ray sorting wrapper)."""
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene.procedural import make_camera

    scene = build_scene(colonnade(target_tris=3000))
    opts = RenderOptions(taa=False, eaw5=False)
    imgs = {}
    for mode, kw in (("stream", {}), ("bvh", {}),
                     ("stream64", dict(stream_block_tris=64))):
        s = RenderSession(width=32, height=32, options=opts,
                          traversal=mode.rstrip("46"), **kw)
        s.set_camera(make_camera("colonnade", 32, 32))
        s.set_scene(scene)
        imgs[mode] = s.render()
    assert np.all(np.isfinite(imgs["stream"]))
    np.testing.assert_allclose(imgs["stream"], imgs["bvh"], atol=2e-5)
    # leaf-block size is a pure performance knob: same hits, same frame
    np.testing.assert_allclose(imgs["stream64"], imgs["bvh"], atol=2e-5)


def test_stream_matches_bvh_backend(rng):
    """Cross-backend agreement on a mid-size scene (stream vs jnp BVH)."""
    from capsaicin_tpu.ops import lbvh, traverse

    scene = build_scene(colonnade(target_tris=3000))
    tris = jnp.asarray(scene.triangles())
    o, d = _rays(rng, 600, spread=5.0)
    sbvh = stream.build_stream_bvh(tris)
    got = stream.stream_closest(sbvh, o, d)
    bvh = lbvh.build_lbvh(tris)
    ref = traverse.bvh_closest(bvh, o, d, 0.0, 1e6)
    gp, rp = np.asarray(got["prim"]), np.asarray(ref["prim"])
    same = gp == rp
    if not same.all():
        np.testing.assert_allclose(
            np.asarray(got["t"])[~same], np.asarray(ref["t"])[~same],
            rtol=1e-4)
