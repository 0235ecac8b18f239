"""Independent NumPy reference renderer for image-level parity oracles.

Every estimator term of rt_indirect.hlsl:42-175 — camera rays, closest-hit,
hit attributes, blue-noise 4x4 sampling with golden-ratio rotation,
cosine-hemisphere mapping, NEE against the animated directional light
(lighting.h:20-61), image-plane reprojection (camera.h:8-37) and the
fp16-quantized feedback history fetch (utils.h:19-36) — is recomputed here
from scratch in float64 NumPy, sharing nothing with capsaicin_tpu except
the blue-noise *table*. Any drift in a framework term fails the oracle
tests that compare against these.
"""

import numpy as np

GOLDEN = 0.61803398875
SKY = np.array([0.7, 0.7, 0.85], np.float64)
KD = 0.75 ** 2.2


def np_closest(scene, o, d, tmin, tmax):
    """Brute-force Moller-Trumbore closest hit over all triangles."""
    v0 = np.asarray(scene.tri_v0, np.float64)
    e1 = np.asarray(scene.tri_v1, np.float64) - v0
    e2 = np.asarray(scene.tri_v2, np.float64) - v0
    pvec = np.cross(d[:, None], e2[None])
    det = np.sum(e1[None] * pvec, -1)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o[:, None] - v0[None]
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1[None])
    v = np.sum(d[:, None] * qvec, -1) * inv
    t = np.sum(e2[None] * qvec, -1) * inv
    ok = (
        (np.abs(det) > 1e-12)
        & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > tmin) & (t < tmax)
    )
    t = np.where(ok, t, 1e30)
    j = np.argmin(t, 1)
    rows = np.arange(o.shape[0])
    hit = t[rows, j] < 1e30
    return np.where(hit, j, -1), u[rows, j], v[rows, j]


def np_attrs(scene, prim, u, v):
    """Barycentric position/normal interpolation (scene fetch_hit_attributes)."""
    p = np.clip(prim, 0, None)
    w = (1 - u - v)[:, None]
    uu = u[:, None]
    vv = v[:, None]
    pos = (
        np.asarray(scene.tri_v0)[p] * w
        + np.asarray(scene.tri_v1)[p] * uu
        + np.asarray(scene.tri_v2)[p] * vv
    )
    n = (
        np.asarray(scene.tri_n0)[p] * w
        + np.asarray(scene.tri_n1)[p] * uu
        + np.asarray(scene.tri_n2)[p] * vv
    )
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return pos, n


def np_light(frame_count):
    """Animated directional light; lighting.h:20-33."""
    t = 2.0 * 3.14 * (frame_count % 4096) / 4096.0
    d = np.array([40 * np.sin(t), 100.0, 40 * np.cos(t)])
    d /= np.linalg.norm(d)
    li = np.array([28.0, 24.0, 22.0 + 2.0 * np.cos(t)])
    return d, li


def np_bluenoise4x4(noise, xs, ys, count):
    """sampling.h:14-24, recomputed as a direct per-pixel gather."""
    px = (count % 16) % 4
    py = (count % 16) // 4
    sx = (xs * 4 + px) % 256
    sy = (ys * 4 + py) % 256
    return np.mod(noise[sy, sx].astype(np.float64) + GOLDEN * (count // 16), 1.0)


def np_map_to_hemisphere(s, n):
    """sampling.h:92-132 (ortho vector + cosine-power e=1 mapping)."""
    nx, ny, nz = n[:, 0], n[:, 1], n[:, 2]
    kz = np.sqrt(ny * ny + nz * nz)
    kz = np.where(kz == 0.0, 1.0, kz)
    p_a = np.stack([np.zeros_like(nx), -nz / kz, ny / kz], -1)
    kx = np.sqrt(nx * nx + ny * ny)
    kx = np.where(kx == 0.0, 1.0, kx)
    p_b = np.stack([ny / kx, -nx / kx, np.zeros_like(nx)], -1)
    u = np.where((np.abs(nz) > 0.0)[:, None], p_a, p_b)
    v = np.cross(u, n)
    u = np.cross(n, v)
    r1, r2 = s[:, 0], s[:, 1]
    sin_psi = np.sin(2 * np.pi * r1)
    cos_psi = np.cos(2 * np.pi * r1)
    cos_theta = np.power(1.0 - r2, 0.5)
    sin_theta = np.sqrt(np.maximum(1 - cos_theta * cos_theta, 0.0))
    d = (
        u * (sin_theta * cos_psi)[:, None]
        + v * (sin_theta * sin_psi)[:, None]
        + n * cos_theta[:, None]
    )
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


HALTON8 = [
    (0.5, 1 / 3), (0.25, 2 / 3), (0.75, 1 / 9), (0.125, 4 / 9),
    (0.625, 7 / 9), (0.375, 2 / 9), (0.875, 5 / 9), (0.0625, 8 / 9),
]


def np_primary_rays(camera, xs, ys, width, height, frame_count):
    """Jittered camera rays at explicit full-res pixel coords; camera.h:39-63.

    xs/ys are flat integer pixel coordinate arrays (any subset/ordering of
    the full-res grid — the lowres-interleave estimator traces the phase
    subsample (2x+ox, 2y+oy)).
    """
    s = np.array(HALTON8[frame_count % 8], np.float64)
    xy = np.stack([xs, ys], -1).astype(np.float64)
    img = (xy + s) / np.array([width, height]) - 0.5
    cs = img * np.asarray(camera.sensor_size)
    d = (
        float(camera.focal_length) * np.asarray(camera.forward)
        + cs[:, 0:1] * np.asarray(camera.right)
        + cs[:, 1:2] * np.asarray(camera.up)
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.asarray(camera.position, np.float64), d.shape)
    return o, d


def np_image_plane_uv(camera, p):
    """Project world positions onto the image plane -> uv in [0,1]; camera.h:8-37."""
    pos = np.asarray(camera.position, np.float64)
    fwd = np.asarray(camera.forward, np.float64)
    n = fwd / np.linalg.norm(fwd)
    plane = pos + n * float(camera.focal_length)
    d = p - pos
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.dot(plane - pos, n) / np.sum(d * n, -1)
    ip = pos + t[:, None] * d
    ipd = ip - plane
    sw, sh = np.asarray(camera.sensor_size, np.float64)
    u = np.sum(ipd * np.asarray(camera.right), -1) / (0.5 * sw)
    v = np.sum(ipd * np.asarray(camera.up), -1) / (0.5 * sh)
    return 0.5 * np.stack([u, v], -1) + 0.5


def np_indirect_1bounce(scene, camera, noise, frame_count, xs, ys,
                        width, height, feedback=None, aux=None,
                        noise_frame=None):
    """The full rt_indirect estimator at explicit pixel coords, 1 diffuse
    bounce, optionally with the GBUFFER_FEEDBACK history-reuse branch
    (rt_indirect.hlsl:91-174, incl. :118-145 feedback).

    feedback: None, or a dict {"history": [H,W,3], "prev_depth": [H,W],
    "prev_camera": Camera} — the fp16 texture quantization of the RGBA16F
    combined-history (raytracing_system.cpp:466-575) is applied here too.
    aux: optional dict; the feedback branch records its "reuse" and
    "disocc" lane masks there (for test non-vacuousness asserts).
    noise_frame: blue-noise seed frame; defaults to frame_count. Batched
    spp draws sample set s from noise_frame = frame*spp + s while the
    camera jitter and light animation stay at the real frame.
    Returns flat [len(xs), 3] colors.
    """
    if noise_frame is None:
        noise_frame = frame_count
    o, d = np_primary_rays(camera, xs, ys, width, height, frame_count)
    prim, u, v = np_closest(scene, o, d, 0.0, 1e6)
    active = prim >= 0
    color = np.zeros((o.shape[0], 3))

    # bounce 0: sample the hemisphere at the primary hit
    p, n = np_attrs(scene, prim, u, v)
    s = np_bluenoise4x4(noise, xs, ys, noise_frame * 25 + 0)
    bd = np_map_to_hemisphere(s, n)
    cos = np.maximum(0.0, np.sum(n * bd, -1))
    pdf = cos / np.pi
    active = active & (pdf >= 1e-5)
    throughput = ((1.0 / np.pi) * cos / np.maximum(pdf, 1e-20))[:, None]

    prim2, u2, v2 = np_closest(scene, p, bd, 1e-4, 1e5)

    # bounce 1: sky on miss
    miss = active & (prim2 < 0)
    color = np.where(miss[:, None], color + throughput * SKY, color)
    active = active & (prim2 >= 0)
    p2, n2 = np_attrs(scene, prim2, u2, v2)

    if feedback is not None:
        prev_cam = feedback["prev_camera"]
        hist16 = np.asarray(feedback["history"], np.float16).astype(np.float64)
        depth16 = np.asarray(feedback["prev_depth"], np.float16).astype(np.float64)
        uv = np_image_plane_uv(prev_cam, p2)
        offscreen = np.any((uv < 0.0) | (uv > 1.0), -1)
        # uv_to_xy: clamp to dim-1 (utils.h:5-9)
        xy = np.minimum(uv * np.array([width, height], np.float64),
                        np.array([width - 1, height - 1], np.float64))
        # edge-clamp bilinear at half-pixel centers (utils.h:19-36)
        xy0 = xy - 0.5
        bx = np.floor(xy0[:, 0]).astype(np.int64)
        by = np.floor(xy0[:, 1]).astype(np.int64)
        wx = np.where(bx < 0, 0.0, xy0[:, 0] - np.floor(xy0[:, 0]))[:, None]
        wy = np.where(by < 0, 0.0, xy0[:, 1] - np.floor(xy0[:, 1]))[:, None]
        bxc = np.maximum(bx, 0)
        byc = np.maximum(by, 0)
        bx1 = np.minimum(bxc + 1, width - 1)
        by1 = np.minimum(byc + 1, height - 1)
        c00 = hist16[byc, bxc]
        c10 = hist16[byc, bx1]
        c01 = hist16[by1, bxc]
        c11 = hist16[by1, bx1]
        hist = ((c00 * (1 - wx) + c10 * wx) * (1 - wy)
                + (c01 * (1 - wx) + c11 * wx) * wy)
        # point fetch of prev depth (Load at int coords, rt_indirect.hlsl:125)
        px = np.clip(np.floor(xy[:, 0]).astype(np.int64), 0, width - 1)
        py = np.clip(np.floor(xy[:, 1]).astype(np.int64), 0, height - 1)
        prev_depth = depth16[py, px]
        cur_depth = np.linalg.norm(
            p2 - np.asarray(prev_cam.position, np.float64), axis=-1
        )
        disocc = offscreen | (
            np.abs(prev_depth - cur_depth) / np.maximum(cur_depth, 1e-20) > 0.05
        )
        reuse = active & ~disocc
        color = np.where(reuse[:, None], color + throughput * hist, color)
        if aux is not None:
            aux["reuse"] = reuse
            aux["disocc"] = active & disocc
        active = active & disocc

    # NEE at the bounce hit
    ldir, li = np_light(frame_count)
    shadow, _, _ = np_closest(scene, p2, np.broadcast_to(ldir, p2.shape), 1e-4, 1e5)
    ndotl = np.maximum(0.0, np.sum(n2 * ldir, -1))
    nee = li[None] * KD / np.pi * ndotl[:, None]
    color = np.where(
        (active & (shadow < 0))[:, None], color + throughput * nee, color
    )
    color = np.where((prim >= 0)[:, None], color, 0.0)
    return color


# ---------------------------------------------------------------------------
# Post-stack oracle: direct lighting + gather + SVGF + EAW + combine for a
# static-camera sequence (temporal_accumulation.hlsl Accumulate,
# spatial_gather.hlsl, eaw_blur.hlsl, combine_illumination.hlsl), all
# re-derived here in float64 NumPy.

EPS = 1e-8
MAX_HISTORY_LENGTH = 256.0  # temporal_accumulation.hlsl:218
FIREFLY_CLAMP = 10.0  # eaw_blur.hlsl:30-33
SPATIAL_VARIANCE_THRESHOLD = 8.0  # eaw_blur.hlsl:141


def np_luminance(rgb):
    return rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114


def np_oct_roundtrip(n):
    """oct encode->decode roundtrip (the G-buffer stores octahedral
    normals; filters consume the decoded field)."""
    s = np.sum(np.abs(n), -1, keepdims=True)
    f = n[..., :2] / s
    wrap = (1.0 - np.abs(f[..., ::-1])) * np.where(f >= 0.0, 1.0, -1.0)
    f = np.where(n[..., 2:3] >= 0.0, f, wrap)
    # decode
    z = 1.0 - np.abs(f[..., 0]) - np.abs(f[..., 1])
    t = np.clip(-z, 0.0, 1.0)[..., None]
    xy = f + np.where(f >= 0.0, -t, t)
    out = np.concatenate([xy, z[..., None]], -1)
    return out / np.linalg.norm(out, axis=-1, keepdims=True)


def _np_shift(img, dx, dy):
    """out[y,x] = img[y+dy, x+dx] + validity mask (no wrap)."""
    h, w = img.shape[:2]
    rolled = np.roll(img, shift=(-dy, -dx), axis=(0, 1))
    ys = np.arange(h)[:, None] + dy
    xs = np.arange(w)[None, :] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return rolled, valid


def _w_normal(n0, n1, s):
    return np.power(np.maximum(np.sum(n0 * n1, -1), 0.0), s)


def _w_depth(dc, dp, s):
    t = np.where(s == 0.0, 0.0, np.abs(dc - dp) / np.where(s == 0.0, 1.0, s))
    return np.exp(-t)


def _w_luma(lc, lp, s):
    return np.exp(-np.abs(lc - lp) / s)


def np_direct_lighting(scene, camera, noise, frame_count, width, height):
    """rt_direct_lighting.hlsl: NEE at primary hits, sky on miss.
    Returns (direct [H,W,3], albedo [H,W,3], nd dict)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    o, d = np_primary_rays(camera, xs.reshape(-1), ys.reshape(-1),
                           width, height, frame_count)
    prim, u, v = np_closest(scene, o, d, 0.0, 1e6)
    miss = prim < 0
    p, n = np_attrs(scene, prim, u, v)
    kd = np.full((o.shape[0], 3), KD)
    ldir, li = np_light(frame_count)
    ndotl = np.maximum(0.0, np.sum(n * ldir, -1))
    unshadowed = li[None] / np.pi * kd * ndotl[:, None]
    shadow, _, _ = np_closest(
        scene, p, np.broadcast_to(ldir, p.shape), 1e-4, 1e5
    )
    di = np.where((shadow >= 0)[:, None], 0.0, unshadowed)
    depth = np.linalg.norm(np.asarray(camera.position, np.float64) - p, axis=-1)

    direct = np.where(miss[:, None], SKY, di)
    albedo = np.where(miss[:, None], 1.0, kd)
    nrm = np.where(miss[:, None], 0.0, np_oct_roundtrip(n))
    nd_depth = np.where(miss, 0.0, depth)
    sh = (height, width)
    return (
        direct.reshape(sh + (3,)),
        albedo.reshape(sh + (3,)),
        {"normal": nrm.reshape(sh + (3,)), "depth": nd_depth.reshape(sh)},
    )


def np_spatial_gather(indirect, nd, s_normal, s_depth_sigma, s_luma):
    """spatial_gather.hlsl: 7x7 edge-aware cross-bilateral filter."""
    cn, cd, cc = nd["normal"], nd["depth"], indirect
    cl = np_luminance(cc)
    s_depth = cd * s_depth_sigma
    background = cd < 1e-5
    acc = np.zeros_like(cc)
    tw = np.zeros_like(cd)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            c, valid = _np_shift(cc, dx, dy)
            n_tap, _ = _np_shift(cn, dx, dy)
            d_tap, _ = _np_shift(cd, dx, dy)
            l_tap, _ = _np_shift(cl, dx, dy)
            valid = valid & (d_tap >= 1e-5)
            r = float((dx * dx + dy * dy) ** 0.5)
            w = (
                _w_normal(cn, n_tap, s_normal)
                * _w_depth(cd, d_tap, s_depth * r)
                * _w_luma(cl, l_tap, s_luma)
            )
            w = np.where(valid, w, 0.0)
            acc = acc + w[..., None] * c
            tw = tw + w
    filt = np.where((tw < EPS)[..., None], cc, acc / np.maximum(tw, EPS)[..., None])
    return np.where(background[..., None], cc, filt)


def np_closest_depth_3x3(depth):
    """3x3 min of nonzero depths; temporal_accumulation.hlsl:179-205."""
    best = depth.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            d_tap, valid = _np_shift(depth, dx, dy)
            take = valid & (d_tap != 0.0) & (d_tap < best)
            best = np.where(take, d_tap, best)
    return best


def np_svgf_accumulate_static(color, nd, prev, frame_count, alpha_setting):
    """Accumulate for a STATIC camera: the history fetch is the identity
    (the framework's zero-gather static path); disocclusion still applies
    the 5% closest-depth test vs the previous frame's 3x3-min depth.

    prev: dict(color_history [H,W,4], moments_history [H,W,4],
    prev_depth [H,W], camera). Returns (color4, moments4)."""
    lum = np_luminance(color)
    fresh = np.stack([lum, lum * lum], -1)
    depth = nd["depth"]
    background = depth < 1e-5

    # cur closest == camera-distance depth reconstructed at the pixel
    cur_closest = depth
    prev_closest = np_closest_depth_3x3(prev["prev_depth"])
    disocc = (frame_count == 0) | (
        np.abs(prev_closest - cur_closest) / np.maximum(cur_closest, 1e-20) > 0.05
    )

    history = prev["color_history"][..., :3]
    moments_hist = prev["moments_history"][..., :2]
    hist_len = prev["moments_history"][..., 3]

    alpha = np.minimum(alpha_setting, 1.0 - 1.0 / (hist_len + 1.0))
    alpha = np.where(hist_len < MAX_HISTORY_LENGTH, alpha, alpha_setting)

    moments = fresh * (1.0 - alpha[..., None]) + moments_hist * alpha[..., None]
    variance = np.abs(moments[..., 1] - moments[..., 0] ** 2)
    blended = color * (1.0 - alpha[..., None]) + history * alpha[..., None]

    reset = background | disocc
    z = np.zeros_like(lum)[..., None]
    one = np.ones_like(lum)[..., None]
    out_c = np.where(
        reset[..., None],
        np.concatenate([color, z], -1),
        np.concatenate([blended, variance[..., None]], -1),
    )
    out_m = np.where(
        reset[..., None],
        np.concatenate([fresh, z, one], -1),
        np.concatenate([moments, z, (hist_len + 1.0)[..., None]], -1),
    )
    return out_c, out_m


_EAW_KW = (1.0, 2.0 / 3.0, 1.0 / 6.0)  # eaw_blur.hlsl:76


def np_eaw_blur(color4, nd, stride, s_normal, s_depth_sigma, s_luma_sigma,
                use_variance=True):
    """One eaw_blur.hlsl Blur dispatch (5x5 a-trous)."""
    rgb = np.minimum(color4[..., :3], FIREFLY_CLAMP)
    var = color4[..., 3]
    cn, cd = nd["normal"], nd["depth"]
    cl = np_luminance(rgb)
    clamped4 = np.concatenate([rgb, var[..., None]], -1)
    s_depth = cd * float(stride) * s_depth_sigma
    s_luma = s_luma_sigma * np.sqrt(np.maximum(0.0, var + EPS))
    acc_c = np.zeros_like(rgb)
    acc_v = np.zeros_like(var)
    tw = np.zeros_like(var)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            sx, sy = dx * stride, dy * stride
            c4, valid = _np_shift(clamped4, sx, sy)
            n_tap, _ = _np_shift(cn, sx, sy)
            d_tap, _ = _np_shift(cd, sx, sy)
            valid = valid & (d_tap >= 1e-5)
            r = float((dx * dx + dy * dy) ** 0.5)
            w = _w_normal(cn, n_tap, s_normal) * _w_depth(cd, d_tap, s_depth * r)
            if use_variance:
                l_tap, _ = _np_shift(cl, sx, sy)
                lw = _w_luma(cl, l_tap, s_luma)
                hw = _EAW_KW[abs(dx)] * _EAW_KW[abs(dy)]
            else:
                lw = 1.0
                hw = 1.0
            w_full = np.where(valid, w * hw * lw, 0.0)
            acc_c = acc_c + w_full[..., None] * c4[..., :3]
            tw = tw + w_full
            if use_variance:
                w_sq = np.where(valid, (hw * w) ** 2 * lw * lw, 0.0)
                acc_v = acc_v + w_sq * c4[..., 3]
    out_c = np.where((tw < EPS)[..., None], rgb, acc_c / np.maximum(tw, EPS)[..., None])
    out_v = np.where(tw < EPS, var, acc_v / np.maximum(tw, EPS) ** 2)
    background = cd < 1e-5
    out_c = np.where(background[..., None], rgb, out_c)
    out_v = np.where(background, var, out_v)
    return np.concatenate([out_c, out_v[..., None]], -1)


def np_eaw_disocclusion(color4, nd, moments4, s_normal, s_depth_sigma, s_luma):
    """eaw_blur.hlsl:139-223 BlurDisocclusion (7x7 + spatial variance)."""
    rgb = np.minimum(color4[..., :3], FIREFLY_CLAMP)
    var = color4[..., 3]
    hist_len = moments4[..., 3]
    cn, cd = nd["normal"], nd["depth"]
    cl = np_luminance(rgb)
    packed = np.concatenate([rgb, cl[..., None], moments4[..., :2]], -1)
    s_depth = cd * s_depth_sigma
    acc_c = np.zeros_like(rgb)
    acc_m = np.zeros_like(moments4[..., :2])
    tw = np.zeros_like(var)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            p_tap, valid = _np_shift(packed, dx, dy)
            n_tap, _ = _np_shift(cn, dx, dy)
            d_tap, _ = _np_shift(cd, dx, dy)
            valid = valid & (d_tap >= 1e-5)
            r = float((dx * dx + dy * dy) ** 0.5)
            w = (
                _w_normal(cn, n_tap, s_normal)
                * _w_depth(cd, d_tap, s_depth * r)
                * _w_luma(cl, p_tap[..., 3], s_luma)
            )
            w = np.where(valid, w, 0.0)
            acc_c = acc_c + w[..., None] * p_tap[..., :3]
            acc_m = acc_m + w[..., None] * p_tap[..., 4:6]
            tw = tw + w
    f_c = np.where((tw < EPS)[..., None], rgb, acc_c / np.maximum(tw, EPS)[..., None])
    f_m = np.where((tw < EPS)[..., None], 0.0, acc_m / np.maximum(tw, EPS)[..., None])
    boost = SPATIAL_VARIANCE_THRESHOLD / np.maximum(hist_len, 1e-5)
    f_v = boost * np.abs(f_m[..., 1] - f_m[..., 0] ** 2)
    passthrough = (cd < 1e-5) | (hist_len >= SPATIAL_VARIANCE_THRESHOLD)
    out_c = np.where(passthrough[..., None], rgb, f_c)
    out_v = np.where(passthrough, var, f_v)
    return np.concatenate([out_c, out_v[..., None]], -1)


def np_denoise(color4, nd, moments4, s_normal, s_depth, s_luma,
               eaw5=False, use_variance=True):
    """The EAW chain: disocclusion blur then strides 1, 3 (, 5, 7)."""
    x = np_eaw_disocclusion(color4, nd, moments4, s_normal, s_depth, s_luma)
    for s in (1, 3, 5, 7) if eaw5 else (1, 3):
        x = np_eaw_blur(x, nd, s, s_normal, s_depth, s_luma, use_variance)
    return x


# ---------------------------------------------------------------------------
# Moving-camera reprojection + TAA oracle (temporal_accumulation.hlsl TAA +
# the ResampleBicubic history fetch, which — see the reference quirk note in
# ops/resample.py — evaluates Catmull-Rom at integer tap offsets and thus
# reduces exactly to the luma-weighted center bilinear tap).


def np_reconstruct_position(camera, uv, depth):
    """camera.h:65-80."""
    h_sample = uv - 0.5
    cs = h_sample * np.asarray(camera.sensor_size, np.float64)
    d = (
        float(camera.focal_length) * np.asarray(camera.forward, np.float64)
        + cs[..., 0:1] * np.asarray(camera.right, np.float64)
        + cs[..., 1:2] * np.asarray(camera.up, np.float64)
    )
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return np.asarray(camera.position, np.float64) + depth[..., None] * d


def np_reproject(camera, prev_camera, depth, width, height):
    """The shared per-frame reprojection (temporal_accumulation.hlsl:243-258):
    this_uv, prev_uv/prev_xy, velocity, offscreen. Background lanes (depth 0)
    produce garbage that every consumer masks; they are zeroed here."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    this_uv = np.stack([(xs + 0.5) / width, (ys + 0.5) / height], -1)
    fg = depth > 1e-5
    hit = np_reconstruct_position(camera, this_uv, depth)
    with np.errstate(invalid="ignore", divide="ignore"):
        prev_uv = np_image_plane_uv(
            prev_camera, hit.reshape(-1, 3)
        ).reshape(height, width, 2)
    prev_uv = np.where(fg[..., None], prev_uv, 0.5)
    prev_xy = np.minimum(
        prev_uv * np.array([width, height], np.float64),
        np.array([width - 1, height - 1], np.float64),
    )
    velocity = np.sqrt(
        np.sum(((prev_uv - this_uv) * np.array([width, height])) ** 2, -1)
    )
    offscreen = np.any((prev_uv < 0.0) | (prev_uv > 1.0), -1)
    # disocclusion compares against distance from the PREVIOUS camera
    cur_closest = np.linalg.norm(
        hit - np.asarray(prev_camera.position, np.float64), axis=-1
    )
    return {
        "prev_uv": prev_uv, "prev_xy": prev_xy,
        "velocity": velocity, "offscreen": offscreen, "fg": fg,
        "cur_closest": cur_closest,
    }


def np_fetch_history_moving(field, prev_xy, width, height):
    """The moving-path history resample: luma-weighted 3x3 'bicubic' whose
    outer taps carry cubic(1)=0 — i.e. the clamp-bilinear value at
    prev_xy - 0.5, zeroed where the (clamped) center tap is off-image."""
    xy0 = prev_xy - 0.5
    bx = np.floor(xy0[..., 0]).astype(np.int64)
    by = np.floor(xy0[..., 1]).astype(np.int64)
    fx = (xy0[..., 0] - np.floor(xy0[..., 0]))[..., None]
    fy = (xy0[..., 1] - np.floor(xy0[..., 1]))[..., None]
    x0 = np.clip(bx, 0, width - 1)
    x1 = np.clip(bx + 1, 0, width - 1)
    y0 = np.clip(by, 0, height - 1)
    y1 = np.clip(by + 1, 0, height - 1)
    v00 = field[y0, x0]
    v10 = field[y0, x1]
    v01 = field[y1, x0]
    v11 = field[y1, x1]
    val = (v00 * (1 - fx) + v10 * fx) * (1 - fy) + (
        v01 * (1 - fx) + v11 * fx
    ) * fy
    center = prev_xy  # already min-clamped to dim-1; only < 0 can be off
    off = (center[..., 0] < 0.0) | (center[..., 1] < 0.0)
    return np.where(off[..., None], 0.0, val)


def np_point_fetch_moving(field2, prev_xy, width, height):
    """Point fetch at floor(prev_xy) via the 2x2 corner select
    (zero when the clipped point is not one of the bilinear corners)."""
    bx = np.floor(prev_xy[..., 0] - 0.5).astype(np.int64)
    by = np.floor(prev_xy[..., 1] - 0.5).astype(np.int64)
    px = np.clip(np.floor(prev_xy[..., 0]).astype(np.int64), 0, width - 1)
    py = np.clip(np.floor(prev_xy[..., 1]).astype(np.int64), 0, height - 1)
    di = px - bx
    dj = py - by
    ok = ((di == 0) | (di == 1)) & ((dj == 0) | (dj == 1))
    return np.where(ok[..., None], field2[py, px], 0.0)


def np_svgf_accumulate_moving(color, nd, rep_fetch, frame_count, alpha_setting):
    """Accumulate with a moving camera: history/moments/len/prev_closest come
    from the reprojected fetch; disocclusion adds the offscreen flag."""
    lum = np_luminance(color)
    fresh = np.stack([lum, lum * lum], -1)
    depth = nd["depth"]
    background = depth < 1e-5

    cur_closest = rep_fetch["cur_closest"]
    disocc = rep_fetch["offscreen"] | (frame_count == 0) | (
        np.abs(rep_fetch["prev_closest"] - cur_closest)
        / np.maximum(cur_closest, 1e-20) > 0.05
    )
    history = rep_fetch["history"]
    moments_hist = rep_fetch["moments"]
    hist_len = rep_fetch["hist_len"]

    alpha = np.minimum(alpha_setting, 1.0 - 1.0 / (hist_len + 1.0))
    alpha = np.where(hist_len < MAX_HISTORY_LENGTH, alpha, alpha_setting)
    moments = fresh * (1.0 - alpha[..., None]) + moments_hist * alpha[..., None]
    variance = np.abs(moments[..., 1] - moments[..., 0] ** 2)
    blended = color * (1.0 - alpha[..., None]) + history * alpha[..., None]

    reset = background | disocc
    z = np.zeros_like(lum)[..., None]
    one = np.ones_like(lum)[..., None]
    out_c = np.where(
        reset[..., None],
        np.concatenate([color, z], -1),
        np.concatenate([blended, variance[..., None]], -1),
    )
    out_m = np.where(
        reset[..., None],
        np.concatenate([fresh, z, one], -1),
        np.concatenate([moments, z, (hist_len + 1.0)[..., None]], -1),
    )
    return out_c, out_m, reset


def np_simple_tonemap(v):
    return v / (1.0 + np_luminance(v))[..., None]


def np_invert_simple_tonemap(v):
    return v / (1.0 - np_luminance(v))[..., None]


def np_rgb_to_ycocg(c):
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    return np.stack(
        [r / 4 + g / 2 + b / 4, r / 2 - b / 2, -r / 4 + g / 2 - b / 4], -1
    )


def np_ycocg_to_rgb(c):
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return np.clip(np.stack([y + co - cg, y + cg, y - co - cg], -1), 0.0, 1.0)


def _np_shift_clamped(img, dx, dy):
    h, w = img.shape[:2]
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def np_taa(combined, taa_history, rep, depth, taa_feedback):
    """temporal_accumulation.hlsl TAA: velocity-adaptive alpha, 5x5 YCoCg
    mean+-scale*sigma AABB clip of tonemapped history, blend, un-tonemap."""
    background = depth < 1e-5
    velocity = rep["velocity"]
    offscreen = rep["offscreen"]
    is_static = velocity < 1e-3
    alpha = np.minimum(taa_feedback, np.where(is_static, 0.98, 0.6))
    scale = np.where(is_static, 5.0, 0.75)

    tc = np_rgb_to_ycocg(np_simple_tonemap(combined))
    m1 = np.zeros_like(tc)
    m2 = np.zeros_like(tc)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            v = _np_shift_clamped(tc, dx, dy)
            m1 = m1 + v
            m2 = m2 + v * v
    m1 /= 25.0
    m2 /= 25.0
    dev = np.sqrt(np.abs(m2 - m1 * m1)) * scale[..., None]
    pmin = np.minimum(m1 - dev, tc)
    pmax = np.maximum(m1 + dev, tc)

    hist = np_rgb_to_ycocg(np_simple_tonemap(taa_history))
    c = 0.5 * (pmin + pmax)
    radius = 0.5 * (pmax - pmin)
    dc = hist - c
    with np.errstate(invalid="ignore", divide="ignore"):
        clip = dc / (radius + 1e-5)
        max_extent = np.max(np.abs(clip), -1)
        clipped = c + dc / max_extent[..., None]
    hist = np.where((max_extent > 1.0)[..., None], clipped, hist)

    blended = np_invert_simple_tonemap(
        np_ycocg_to_rgb(tc * (1.0 - alpha[..., None]) + hist * alpha[..., None])
    )
    return np.where((background | offscreen)[..., None], combined, blended)


# ---------------------------------------------------------------------------
# UPSCALE2X (lowres-interleave) post-stack pieces: the SVGF current-color
# fetch is bilinear at the identity UV of the doubled grid
# (temporal_accumulation.hlsl:228-232), and the accumulate pass folds the
# 2x2 interleave phase into its alpha (alpha=1 off-phase).


def _np_lerp_axis(img, pos, axis):
    """1-D clamp-bilinear resample of `img` at texel coords `pos` along
    `axis` (separable helper)."""
    n = img.shape[axis]
    x0 = pos - 0.5
    b = np.floor(x0).astype(np.int64)
    f = np.where(b < 0, 0.0, x0 - np.floor(x0))
    b0 = np.clip(b, 0, n - 1)
    b1 = np.clip(b + 1, 0, n - 1)
    a0 = np.take(img, b0, axis=axis)
    a1 = np.take(img, b1, axis=axis)
    shape = [1] * img.ndim
    shape[axis] = len(pos)
    f = f.reshape(shape)
    return a0 * (1.0 - f) + a1 * f


def np_upsample2x(img):
    """[h,w,C] -> [2h,2w,C]: clamp-bilinear at the identity UV of the
    doubled grid, i.e. source coords min((X+0.5)/2, dim-1)."""
    h, w = img.shape[:2]
    sy = np.minimum((np.arange(2 * h) + 0.5) / 2.0, h - 1)
    sx = np.minimum((np.arange(2 * w) + 0.5) / 2.0, w - 1)
    return _np_lerp_axis(_np_lerp_axis(img, sy, 0), sx, 1)


def np_svgf_accumulate_static_lowres(color_half, nd, prev, frame_count,
                                     alpha_setting, ox, oy):
    """Static-camera Accumulate under UPSCALE2X: half-res input upsampled
    2x, off-phase pixels forced alpha=1 with their history length held
    (decremented then re-incremented)."""
    height, width = nd["depth"].shape
    color = np_upsample2x(color_half)
    lum = np_luminance(color)
    fresh = np.stack([lum, lum * lum], -1)
    depth = nd["depth"]
    background = depth < 1e-5

    cur_closest = depth
    prev_closest = np_closest_depth_3x3(prev["prev_depth"])
    disocc = (frame_count == 0) | (
        np.abs(prev_closest - cur_closest) / np.maximum(cur_closest, 1e-20) > 0.05
    )
    history = prev["color_history"][..., :3]
    moments_hist = prev["moments_history"][..., :2]
    hist_len = prev["moments_history"][..., 3]

    alpha = np.minimum(alpha_setting, 1.0 - 1.0 / (hist_len + 1.0))
    alpha = np.where(hist_len < MAX_HISTORY_LENGTH, alpha, alpha_setting)

    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    not_phase = (xs % 2 != ox) | (ys % 2 != oy)
    alpha = np.where(not_phase, 1.0, alpha)
    hist_len = np.where(not_phase, hist_len - 1.0, hist_len)

    moments = fresh * (1.0 - alpha[..., None]) + moments_hist * alpha[..., None]
    variance = np.abs(moments[..., 1] - moments[..., 0] ** 2)
    blended = color * (1.0 - alpha[..., None]) + history * alpha[..., None]

    reset = background | disocc
    z = np.zeros_like(lum)[..., None]
    one = np.ones_like(lum)[..., None]
    out_c = np.where(
        reset[..., None],
        np.concatenate([color, z], -1),
        np.concatenate([blended, variance[..., None]], -1),
    )
    out_m = np.where(
        reset[..., None],
        np.concatenate([fresh, z, one], -1),
        np.concatenate([moments, z, (hist_len + 1.0)[..., None]], -1),
    )
    return out_c, out_m
