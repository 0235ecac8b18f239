"""The shared history fetch must equal the plain per-tap resampling, on both
the static fast path and the quad-packed moving path."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import camera as cam, resample
from capsaicin_tpu.render import passes
from capsaicin_tpu.scene.procedural import make_camera

W = H = 48


def _setup(rng):
    nd = {
        "oct": jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32)),
        "inst": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.asarray(rng.uniform(2, 6, (H, W)).astype(np.float32)),
    }
    ch = jnp.asarray(rng.uniform(0, 1, (H, W, 4)).astype(np.float32))
    mh = jnp.asarray(rng.uniform(0.1, 1, (H, W, 4)).astype(np.float32))
    cb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    return nd, ch, mh, cb


def test_moving_path_matches_reference_bicubic(rng):
    nd, ch, mh, cb = _setup(rng)
    camera = make_camera("cornell", W, H)
    prev_camera = camera._replace(
        position=camera.position + jnp.array([0.05, 0.02, 0.0])
    )
    rep = passes.reproject_and_fetch_history(
        camera, prev_camera, nd, nd, ch, mh, cb, W, H
    )
    prev_uv = rep["prev_uv"]
    # off-frustum pixels reset their history via the disocclusion test, so
    # only in-frustum fetches are compared
    ok = ~np.asarray(rep["offscreen"])

    def chk(got, want, atol=1e-5):
        np.testing.assert_allclose(np.asarray(got)[ok], np.asarray(want)[ok], atol=atol)

    chk(rep["history"], resample.resample_bicubic(ch[..., :3], prev_uv, (W, H)))
    chk(rep["taa_history"], resample.resample_bicubic(cb, prev_uv, (W, H)))
    # moments: reference resamples (m1, m2, 0) with its own luma weight
    m3 = jnp.concatenate([mh[..., :2], jnp.zeros((H, W, 1))], -1)
    chk(rep["moments"], resample.resample_bicubic(m3, prev_uv, (W, H))[..., :2])
    # point fetches at floor(prev_xy)
    prev_xy = np.asarray(rep["prev_xy"])
    px = np.clip(np.floor(prev_xy[..., 0]).astype(int), 0, W - 1)
    py = np.clip(np.floor(prev_xy[..., 1]).astype(int), 0, H - 1)
    chk(rep["hist_len"], np.asarray(mh[..., 3])[py, px], atol=1e-6)


def test_static_path_is_identity(rng):
    nd, ch, mh, cb = _setup(rng)
    camera = make_camera("cornell", W, H)
    rep = passes.reproject_and_fetch_history(camera, camera, nd, nd, ch, mh, cb, W, H)
    np.testing.assert_allclose(np.asarray(rep["history"]), np.asarray(ch[..., :3]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rep["moments"]), np.asarray(mh[..., :2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rep["taa_history"]), np.asarray(cb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rep["hist_len"]), np.asarray(mh[..., 3]), atol=1e-6)


def test_block_order_roundtrip_and_equivalence():
    """8x128-block ray ordering is a pure permutation: roundtrip identity,
    and the traced image is identical with it on or off."""
    import jax.numpy as jnp

    from capsaicin_tpu.render import passes
    from capsaicin_tpu.render.traversal import make_brute_force
    from capsaicin_tpu.scene import build_scene
    from capsaicin_tpu.scene.procedural import cornell_box, make_camera

    h, w = 16, 128
    x = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(h * w, 3)
    rt = passes._from_blocks(passes._to_blocks(x, h, w), h, w)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))

    scene = build_scene(cornell_box())
    camera = make_camera("cornell", w, h)
    closest, any_hit = make_brute_force(scene)
    a = passes.trace_primary(closest, camera, w, h, 0, block_order=False)
    b = passes.trace_primary(closest, camera, w, h, 0, block_order=True)
    np.testing.assert_array_equal(np.asarray(a["prim"]), np.asarray(b["prim"]))
    np.testing.assert_allclose(np.asarray(a["bary"]), np.asarray(b["bary"]), atol=0)
