"""Image resampling: bilinear and luma-weighted bicubic history fetches.

TPU-native reimplementation of /root/reference/src/core/shaders/utils.h
(UVtoXY/XYtoUV/SampleBilinear) and temporal_accumulation.hlsl:38-66
(ResampleBicubic). Images are [H,W,C]; uv coordinates have u horizontal
(x / width) and v vertical (y / height), matching the HLSL texture indexing.

Out-of-range taps are clamped to the image border (the reference's HLSL
out-of-bounds UAV reads return 0, slightly darkening a 1-pixel border; we
clamp, which is strictly better-behaved and irrelevant beyond the border).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mathops import cubic, luminance


def uv_to_xy(uv, dims):
    """UV -> continuous pixel coords, clamped to dim-1; utils.h:5-9. dims=(W,H)."""
    w, h = dims
    xy = uv * jnp.asarray([w, h], jnp.float32)
    return jnp.minimum(xy, jnp.asarray([w - 1, h - 1], jnp.float32))


def xy_to_uv(xy, dims):
    """Pixel coords -> UV clamped to [0,1]; utils.h:12-15. dims=(W,H)."""
    w, h = dims
    return jnp.clip(xy / jnp.asarray([w, h], jnp.float32), 0.0, 1.0)


def _gather_pixels(img, ix, iy):
    """img: [H,W,C]; ix, iy: [...] int32 -> [...,C], indices clamped."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    flat = img.reshape(h * w, *img.shape[2:])
    return jnp.take(flat, iy * w + ix, axis=0)


def sample_point(img, uv, dims):
    """Nearest (floor) fetch at UV; matches texture[uint2(floor(UVtoXY(uv)))]."""
    xy = uv_to_xy(uv, dims)
    ix = jnp.floor(xy[..., 0]).astype(jnp.int32)
    iy = jnp.floor(xy[..., 1]).astype(jnp.int32)
    return _gather_pixels(img, ix, iy)


def sample_bilinear(img, uv, dims):
    """Bilinear fetch; utils.h:19-36."""
    xy = uv_to_xy(uv, dims) - 0.5
    ix = jnp.floor(xy[..., 0]).astype(jnp.int32)
    iy = jnp.floor(xy[..., 1]).astype(jnp.int32)
    w = xy - jnp.floor(xy)
    wx = w[..., 0:1]
    wy = w[..., 1:2]
    v00 = _gather_pixels(img, ix, iy)
    v10 = _gather_pixels(img, ix + 1, iy)
    v01 = _gather_pixels(img, ix, iy + 1)
    v11 = _gather_pixels(img, ix + 1, iy + 1)
    top = v00 * (1.0 - wx) + v10 * wx
    bot = v01 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def bicubic_taps(img, uv, dims):
    """Shared machinery for luma-weighted 3x3 bicubic resampling: returns
    (taps, base_weights, offscreen) where taps is a list of 9 tap values
    [..., C], base_weights the cubic-x*cubic-y weight per tap [...], and
    offscreen the per-tap invalid mask. Callers apply their own luma
    weighting per channel group — this lets several histories share ONE set
    of 16 corner gathers by packing channels (the gathers are the dominant
    cost of the temporal passes on TPU)."""
    w, h = dims
    center_xy = uv_to_xy(uv, dims)
    xy0 = center_xy - 0.5
    base_x = jnp.floor(xy0[..., 0]).astype(jnp.int32)
    base_y = jnp.floor(xy0[..., 1]).astype(jnp.int32)
    fx = (xy0[..., 0] - jnp.floor(xy0[..., 0]))[..., None]
    fy = (xy0[..., 1] - jnp.floor(xy0[..., 1]))[..., None]
    # Materialize the shared coordinate math once: without this barrier XLA
    # fuses (duplicates) the producer chain — typically a full camera
    # reprojection — into all 16 gather index computations and every tap
    # weight, exploding both compile time and runtime ~50x.
    center_xy, base_x, base_y, fx, fy = jax.lax.optimization_barrier(
        (center_xy, base_x, base_y, fx, fy)
    )

    corners = {}
    for cj in (-1, 0, 1, 2):
        for ci in (-1, 0, 1, 2):
            corners[(ci, cj)] = _gather_pixels(img, base_x + ci, base_y + cj)

    taps, weights, offs = [], [], []
    for j in (-1, 0, 1):
        for i in (-1, 0, 1):
            cur = center_xy + jnp.asarray([i, j], jnp.float32)
            offscreen = (
                (cur[..., 0] < 0.0)
                | (cur[..., 1] < 0.0)
                | (cur[..., 0] >= w)
                | (cur[..., 1] >= h)
            )
            v00 = corners[(i, j)]
            v10 = corners[(i + 1, j)]
            v01 = corners[(i, j + 1)]
            v11 = corners[(i + 1, j + 1)]
            top = v00 * (1.0 - fx) + v10 * fx
            bot = v01 * (1.0 - fx) + v11 * fx
            val = top * (1.0 - fy) + bot * fy
            # NOTE (reference-faithful quirk): d = |(i, j)| is an INTEGER
            # offset, and Catmull-Rom cubic(1) == 0, so the 8 outer taps get
            # exactly zero base weight — the reference's own ResampleBicubic
            # (temporal_accumulation.hlsl:45-63) computes d the same way and
            # degenerates identically to the luma-weighted center bilinear
            # tap. Kept bit-faithful; do not "fix" without breaking parity.
            d = jnp.abs(cur - center_xy)
            wt = cubic(d[..., 0], 0.0, 0.5) * cubic(d[..., 1], 0.0, 0.5)
            taps.append(val)
            weights.append(wt)
            offs.append(offscreen)
    return taps, weights, offs


def bicubic_combine(taps, weights, offs, sl=slice(None)):
    """Weighted sum of taps[:, sl] with 1/(1+luma) weighting on the first
    three channels of the slice; matches ResampleBicubic accumulation."""
    filtered = None
    tw = None
    for val, wt, offscreen in zip(taps, weights, offs):
        group = val[..., sl]
        w_full = jnp.where(offscreen, 0.0, wt / (1.0 + luminance(group[..., :3])))
        contrib = w_full[..., None] * group
        filtered = contrib if filtered is None else filtered + contrib
        tw = w_full if tw is None else tw + w_full
    return jnp.where(
        (tw > 1e-5)[..., None], filtered / jnp.maximum(tw, 1e-20)[..., None], 0.0
    )


def resample_bicubic(img, uv, dims):
    """3x3 bicubic (Catmull-Rom b=0,c=0.5) with inverse-luma weighting;
    temporal_accumulation.hlsl:38-66. img channels >= 3; weights use the
    first three channels' luminance.

    Restructured for TPU: all 9 bilinear taps share one 4x4 texel footprint,
    so we issue 16 point gathers once and synthesize every tap from them
    (instead of 36 dependent gathers). Identical math to the per-tap form.
    """
    taps, weights, offs = bicubic_taps(img, uv, dims)
    return bicubic_combine(taps, weights, offs)


def upsample2x_bilinear(img):
    """[h,w,C] -> [2h,2w,C]: exactly sample_bilinear(img, identity_uv of the
    doubled grid, (w,h)) — including uv_to_xy's upper clamp, which collapses
    the last two output rows/cols to a 0.5/0.5 blend of the last two inputs
    — built from shifts and interleaves with ZERO gathers. This is the
    UPSCALE2X current-color fetch of the SVGF accumulate pass
    (temporal_accumulation.hlsl:228-232): its sample position is always the
    identity map, so the general gather is pure waste on TPU.

    Round-5 note: isolated microbenchmarks of alternative pass
    compositions (transpose sandwiches, commuted axis order) read
    anywhere from 0.12 to 31 ms for the SAME computation on the device
    tunnel — its execute-replay cache makes isolated timings of small
    jitted fns meaningless (see bench.py). The product-level A/B is the
    only valid signal, and it is neutral (progressive 128.3 -> 129.9,
    within noise): in-frame, XLA fuses this composition into its
    consumers fine. Do not "optimize" this function on isolated numbers.
    """

    def up(a, axis):
        n = a.shape[axis]
        sl = [slice(None)] * a.ndim

        def take(i0, i1):
            s = list(sl)
            s[axis] = slice(i0, i1)
            return a[tuple(s)]

        m1 = jnp.concatenate([take(0, 1), take(0, n - 1)], axis=axis)
        p1 = jnp.concatenate([take(1, n), take(n - 1, n)], axis=axis)
        even = 0.25 * m1 + 0.75 * a
        odd = 0.75 * a + 0.25 * p1
        out = jnp.stack([even, odd], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] = 2 * n
        out = out.reshape(shape)
        i0 = max(n - 2, 0)  # n == 1 degenerates to the single texel
        edge = 0.5 * (take(i0, i0 + 1) + take(n - 1, n))
        s = list(sl)
        s[axis] = slice(2 * n - 2, 2 * n)
        return out.at[tuple(s)].set(
            jnp.concatenate([edge, edge], axis=axis)
        )

    return up(up(img, 0), 1)
