"""Image-level GI parity oracle (BASELINE.md accuracy north star).

An independent NumPy renderer implements the full 1-bounce indirect-GI
estimator of rt_indirect.hlsl:91-174 — blue-noise 4x4 sampling with
golden-ratio rotation and frame*25+bounce seeding, cosine hemisphere mapping,
throughput = brdf*cos/pdf, per-bounce NEE against the animated directional
light, sky on bounce miss — and the framework's raw indirect output must
match it at equal spp to RMSE <= 1e-3 (single frame AND accumulated).

Only the blue-noise *table* is shared (both sides index it independently);
every estimator term — sample lookup, hemisphere mapping, pdf, throughput,
NEE, seeding — is recomputed here from scratch, so any drift in one of them
fails the test.
"""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.render import passes
from capsaicin_tpu.render.settings import RenderOptions
from capsaicin_tpu.render.traversal import make_brute_force
from capsaicin_tpu.scene import build_scene, textures
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

W = H = 64
GOLDEN = 0.61803398875
SKY = np.array([0.7, 0.7, 0.85], np.float64)


# -- independent NumPy renderer ---------------------------------------------


def _np_closest(scene, o, d, tmin, tmax):
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


def _np_attrs(scene, prim, u, v):
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


def _np_light(frame_count):
    t = 2.0 * 3.14 * (frame_count % 4096) / 4096.0
    d = np.array([40 * np.sin(t), 100.0, 40 * np.cos(t)])
    d /= np.linalg.norm(d)
    li = np.array([28.0, 24.0, 22.0 + 2.0 * np.cos(t)])
    return d, li


def _np_bluenoise4x4(noise, xs, ys, count):
    """sampling.h:14-24, recomputed as a direct per-pixel gather."""
    px = (count % 16) % 4
    py = (count % 16) // 4
    sx = (xs * 4 + px) % 256
    sy = (ys * 4 + py) % 256
    return np.mod(noise[sy, sx].astype(np.float64) + GOLDEN * (count // 16), 1.0)


def _np_map_to_hemisphere(s, n):
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


def _np_primary(scene, camera, frame_count):
    halton = [
        (0.5, 1 / 3), (0.25, 2 / 3), (0.75, 1 / 9), (0.125, 4 / 9),
        (0.625, 7 / 9), (0.375, 2 / 9), (0.875, 5 / 9), (0.0625, 8 / 9),
    ]
    s = np.array(halton[frame_count % 8], np.float64)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    xy = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float64)
    img = (xy + s) / np.array([W, H]) - 0.5
    cs = img * np.asarray(camera.sensor_size)
    d = (
        float(camera.focal_length) * np.asarray(camera.forward)
        + cs[:, 0:1] * np.asarray(camera.right)
        + cs[:, 1:2] * np.asarray(camera.up)
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.asarray(camera.position, np.float64), d.shape)
    return o, d


def _np_indirect_1bounce(scene, camera, noise, frame_count):
    """The full rt_indirect estimator, 1 diffuse bounce, feedback off."""
    o, d = _np_primary(scene, camera, frame_count)
    prim, u, v = _np_closest(scene, o, d, 0.0, 1e6)
    active = prim >= 0
    color = np.zeros((o.shape[0], 3))
    kd = 0.75 ** 2.2

    # bounce 0: sample the hemisphere at the primary hit
    p, n = _np_attrs(scene, prim, u, v)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    s = _np_bluenoise4x4(
        noise, xs.reshape(-1), ys.reshape(-1), frame_count * 25 + 0
    )
    bd = _np_map_to_hemisphere(s, n)
    cos = np.maximum(0.0, np.sum(n * bd, -1))
    pdf = cos / np.pi
    active = active & (pdf >= 1e-5)
    throughput = ((1.0 / np.pi) * cos / np.maximum(pdf, 1e-20))[:, None]

    prim2, u2, v2 = _np_closest(scene, p, bd, 1e-4, 1e5)

    # bounce 1: sky on miss, NEE at the hit
    miss = active & (prim2 < 0)
    color = np.where(miss[:, None], color + throughput * SKY, color)
    active = active & (prim2 >= 0)

    p2, n2 = _np_attrs(scene, prim2, u2, v2)
    ldir, li = _np_light(frame_count)
    shadow, _, _ = _np_closest(scene, p2, np.broadcast_to(ldir, p2.shape), 1e-4, 1e5)
    ndotl = np.maximum(0.0, np.sum(n2 * ldir, -1))
    nee = li[None] * kd / np.pi * ndotl[:, None]
    color = np.where(
        (active & (shadow < 0))[:, None], color + throughput * nee, color
    )
    color = np.where((prim >= 0)[:, None], color, 0.0)
    return color.reshape(H, W, 3)


# -- the parity test ---------------------------------------------------------


def test_gi_1bounce_matches_numpy_oracle():
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    options = RenderOptions(num_diffuse_bounces=1, gbuffer_feedback=False)
    noise = np.asarray(textures.blue_noise_256())
    noise_dev = jnp.asarray(noise)

    frames = 8  # 8 spp accumulated; every frame also checked individually
    acc_got = np.zeros((H, W, 3))
    acc_want = np.zeros((H, W, 3))
    for fc in range(frames):
        gb = passes.trace_primary(closest, camera, W, H, fc)
        got = np.asarray(
            passes.indirect_gi(
                scene, closest, any_hit, camera, camera, gb,
                jnp.zeros((H, W, 3)), None, noise_dev, W, H, fc, options,
            )
        )
        want = _np_indirect_1bounce(scene, camera, noise, fc)
        rmse = float(np.sqrt(np.mean((got - want) ** 2)))
        assert rmse <= 1e-3, f"frame {fc}: GI RMSE {rmse}"
        acc_got += got
        acc_want += want

    acc_got /= frames
    acc_want /= frames
    rmse = float(np.sqrt(np.mean((acc_got - acc_want) ** 2)))
    assert rmse <= 1e-3, f"accumulated {frames}spp GI RMSE {rmse}"
    # the accumulated image must carry real indirect energy (not all zero)
    assert acc_got.mean() > 0.01
