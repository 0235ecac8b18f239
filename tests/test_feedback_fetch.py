"""The roll-built quad fetch used by GBUFFER_FEEDBACK (passes.indirect_gi)
must equal naive clamped bilinear + corner point-fetch semantics
(utils.h:19-36 SampleBilinear; rt_indirect.hlsl:118-145)."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops import resample


def _naive(fb_pack, prev_xy, w, h):
    """Per-pixel clamped bilinear + matching corner point fetch (NumPy)."""
    fb = np.asarray(fb_pack)
    xy = np.asarray(prev_xy)
    n = xy.shape[0]
    bil = np.zeros((n, 4), np.float32)
    point = np.zeros((n,), np.float32)
    for i in range(n):
        x0 = xy[i, 0] - 0.5
        y0 = xy[i, 1] - 0.5
        bx = int(np.floor(x0))
        by = int(np.floor(y0))
        wx = x0 - np.floor(x0)
        wy = y0 - np.floor(y0)

        def at(jx, jy):
            return fb[min(max(jy, 0), h - 1), min(max(jx, 0), w - 1)]

        top = at(bx, by) * (1 - wx) + at(bx + 1, by) * wx
        bot = at(bx, by + 1) * (1 - wx) + at(bx + 1, by + 1) * wx
        bil[i] = top * (1 - wy) + bot * wy
        px = min(max(int(np.floor(xy[i, 0])), 0), w - 1)
        py = min(max(int(np.floor(xy[i, 1])), 0), h - 1)
        point[i] = fb[py, px, 3]
    return bil, point


def _roll_quad(fb_pack, prev_xy, w, h):
    """The formulation from passes.indirect_gi's feedback block."""
    fb_quad = jnp.concatenate(
        [
            fb_pack,
            jnp.roll(fb_pack, -1, axis=1),
            jnp.roll(fb_pack, -1, axis=0),
            jnp.roll(fb_pack, (-1, -1), axis=(0, 1)),
        ],
        axis=-1,
    )
    xy0 = prev_xy - 0.5
    bx = jnp.floor(xy0[..., 0]).astype(jnp.int32)
    by = jnp.floor(xy0[..., 1]).astype(jnp.int32)
    wx = jnp.where(bx < 0, 0.0, xy0[..., 0] - jnp.floor(xy0[..., 0]))[..., None]
    wy = jnp.where(by < 0, 0.0, xy0[..., 1] - jnp.floor(xy0[..., 1]))[..., None]
    bxc = jnp.maximum(bx, 0)
    byc = jnp.maximum(by, 0)
    quad = resample._gather_pixels(fb_quad, bxc, byc)
    c00, c10, c01, c11 = (
        quad[..., 0:4], quad[..., 4:8], quad[..., 8:12], quad[..., 12:16]
    )
    top = c00 * (1.0 - wx) + c10 * wx
    bot = c01 * (1.0 - wx) + c11 * wx
    bil = top * (1.0 - wy) + bot * wy
    pix = jnp.floor(prev_xy).astype(jnp.int32)
    pix_x = jnp.clip(pix[..., 0], 0, w - 1)
    pix_y = jnp.clip(pix[..., 1], 0, h - 1)
    di = pix_x - bxc
    dj = pix_y - byc
    point = jnp.where(
        dj == 0,
        jnp.where(di == 0, c00[..., 3], c10[..., 3]),
        jnp.where(di == 0, c01[..., 3], c11[..., 3]),
    )
    return np.asarray(bil), np.asarray(point)


def test_roll_quad_fetch_matches_naive_bilinear(rng):
    w, h = 37, 23
    fb = rng.random((h, w, 4), dtype=np.float32)
    n = 500
    # include exact-border and clamp-edge positions (uv_to_xy bounds:
    # prev_xy in [0, dim-1])
    xs = rng.random(n, dtype=np.float32) * (w - 1)
    ys = rng.random(n, dtype=np.float32) * (h - 1)
    xs[:10] = [0.0, 0.2, 0.49, 0.5, 0.51, w - 1, w - 1.001, w - 1.5, 1.0, 1.5]
    ys[:10] = [0.0, h - 1, 0.3, 0.5, h - 1.2, 0.0, h - 1, 1.0, 0.49, 0.51]
    prev_xy = jnp.stack([jnp.asarray(xs), jnp.asarray(ys)], axis=-1)

    ref_bil, ref_pt = _naive(fb, prev_xy, w, h)
    got_bil, got_pt = _roll_quad(jnp.asarray(fb), prev_xy, w, h)
    np.testing.assert_allclose(got_bil, ref_bil, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_pt, ref_pt, rtol=1e-6, atol=0)
