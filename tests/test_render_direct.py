"""End-to-end minimum slice (BASELINE config 1, small-res): Cornell box,
primary visibility + direct lighting, validated against an independent
NumPy renderer at RMSE <= 1e-3 (BASELINE.md accuracy target)."""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.ops.camera import Camera
from capsaicin_tpu.render import passes
from capsaicin_tpu.render.settings import RenderOptions
from capsaicin_tpu.render.traversal import make_brute_force
from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

W = H = 64


def _numpy_render_direct(scene, camera, frame_count=0):
    """Independent NumPy implementation of passes 1+2 (primary + direct)."""
    # primary rays (camera.h:39-63), Halton frame jitter
    halton = [
        (0.5, 1 / 3), (0.25, 2 / 3), (0.75, 1 / 9), (0.125, 4 / 9),
        (0.625, 7 / 9), (0.375, 2 / 9), (0.875, 5 / 9), (0.0625, 8 / 9),
    ]
    s = np.array(halton[frame_count % 8], np.float32)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    xy = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    img = (xy + s) / np.array([W, H], np.float32) - 0.5
    cs = img * np.asarray(camera.sensor_size)
    d = (
        float(camera.focal_length) * np.asarray(camera.forward)
        + cs[:, 0:1] * np.asarray(camera.right)
        + cs[:, 1:2] * np.asarray(camera.up)
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.asarray(camera.position), d.shape)

    v0 = scene.tri_v0
    e1 = scene.tri_v1 - v0
    e2 = scene.tri_v2 - v0

    def closest(o, d, tmin, tmax):
        pvec = np.cross(d[:, None], e2[None])
        det = np.sum(e1[None] * pvec, -1)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o[:, None] - v0[None]
        u = np.sum(tvec * pvec, -1) * inv
        qvec = np.cross(tvec, e1[None])
        v = np.sum(d[:, None] * qvec, -1) * inv
        t = np.sum(e2[None] * qvec, -1) * inv
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin) & (t < tmax)
        t = np.where(ok, t, 1e30)
        j = np.argmin(t, 1)
        rows = np.arange(o.shape[0])
        hit = t[rows, j] < 1e30
        return np.where(hit, j, -1), u[rows, j], v[rows, j], t[rows, j]

    prim, u, v, t = closest(o, d, 0.0, 1e6)
    w = (1 - u - v)[:, None]
    p = np.clip(prim, 0, None)
    pos = scene.tri_v0[p] * w + scene.tri_v1[p] * u[:, None] + scene.tri_v2[p] * v[:, None]
    n = scene.tri_n0[p] * w + scene.tri_n1[p] * u[:, None] + scene.tri_n2[p] * v[:, None]
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    kd = 0.75 ** 2.2

    # light (lighting.h:20-33)
    tt = 2.0 * 3.14 * (frame_count % 4096) / 4096.0
    ldir = np.array([40 * np.sin(tt), 100.0, 40 * np.cos(tt)])
    ldir /= np.linalg.norm(ldir)
    li = np.array([28.0, 24.0, 22.0 + 2.0 * np.cos(tt)])

    shadow, _, _, _ = closest(pos, np.broadcast_to(ldir, pos.shape), 1e-4, 1e5)
    ndotl = np.maximum(0.0, np.sum(n * ldir, -1))
    direct = li[None] * kd / np.pi * ndotl[:, None]
    direct = np.where((shadow >= 0)[:, None], 0.0, direct)
    direct = np.where((prim < 0)[:, None], np.array([0.7, 0.7, 0.85]), direct)
    return direct.reshape(H, W, 3), prim.reshape(H, W)


def test_direct_lighting_matches_numpy_oracle():
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    options = RenderOptions()

    gb = passes.trace_primary(closest, camera, W, H, 0)
    direct, albedo, nd = passes.direct_lighting(scene, any_hit, camera, gb, W, H, 0, options)

    want, want_prim = _numpy_render_direct(scene, camera)
    got_prim = np.asarray(gb["prim"])
    # identical hit ids except possible edge-tie pixels
    mismatch = np.mean(got_prim != want_prim)
    assert mismatch < 0.002, f"prim id mismatch rate {mismatch}"

    got = np.asarray(direct)
    rmse = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rmse <= 1e-3, f"direct lighting RMSE {rmse}"

    # gbuffer sanity: hit pixels have depth > 0, miss pixels 0
    depth = np.asarray(nd["depth"])
    assert np.all(depth[got_prim >= 0] > 0.1)
    assert np.all(depth[got_prim < 0] == 0.0)
    # albedo of hits is the gamma-decoded constant 0.75 (scene.h:56-60)
    np.testing.assert_allclose(
        np.asarray(albedo)[got_prim >= 0], 0.75 ** 2.2, atol=1e-5
    )


def test_shadowing_present():
    """The boxes must cast shadows: some floor pixels are lit, some dark."""
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    gb = passes.trace_primary(closest, camera, W, H, 0)
    direct, _, _ = passes.direct_lighting(
        scene, any_hit, camera, gb, W, H, 0, RenderOptions()
    )
    d = np.asarray(direct)
    prim = np.asarray(gb["prim"])
    hit_lum = d[..., 1][prim >= 0]
    assert (hit_lum == 0).mean() > 0.05  # shadowed / unlit-facing pixels
    assert (hit_lum > 0.1).mean() > 0.005  # skylight-lit pixels
