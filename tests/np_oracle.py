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
                        width, height, feedback=None, aux=None):
    """The full rt_indirect estimator at explicit pixel coords, 1 diffuse
    bounce, optionally with the GBUFFER_FEEDBACK history-reuse branch
    (rt_indirect.hlsl:91-174, incl. :118-145 feedback).

    feedback: None, or a dict {"history": [H,W,3], "prev_depth": [H,W],
    "prev_camera": Camera} — the fp16 texture quantization of the RGBA16F
    combined-history (raytracing_system.cpp:466-575) is applied here too.
    aux: optional dict; the feedback branch records its "reuse" and
    "disocc" lane masks there (for test non-vacuousness asserts).
    Returns flat [len(xs), 3] colors.
    """
    o, d = np_primary_rays(camera, xs, ys, width, height, frame_count)
    prim, u, v = np_closest(scene, o, d, 0.0, 1e6)
    active = prim >= 0
    color = np.zeros((o.shape[0], 3))

    # bounce 0: sample the hemisphere at the primary hit
    p, n = np_attrs(scene, prim, u, v)
    s = np_bluenoise4x4(noise, xs, ys, frame_count * 25 + 0)
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
