"""Full-pipeline image oracle: a 2-frame static-camera sequence through
direct + GI + spatial gather + SVGF accumulate + EAW chain + combine,
compared against the independent NumPy renderer (tests/np_oracle.py) on the
FINAL gamma-encoded display output. RMSE <= 1e-3 per frame.

Covers temporal_accumulation.hlsl Accumulate (static-camera history reuse,
5% closest-depth disocclusion, alpha ramp), spatial_gather.hlsl,
eaw_blur.hlsl (BlurDisocclusion + the full 5-stage strides 1,3,5,7 chain),
and combine_illumination.hlsl — every post-stack term recomputed from
scratch in float64. TAA is covered separately (its velocity-vs-1e-3-px
branch sits exactly at fp32 reprojection noise for a static camera, so a
float64 oracle cannot deterministically predict per-pixel branch choice;
the TAA math itself is unit-tested in test_pipeline).
"""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.render import pipeline
from capsaicin_tpu.render.settings import RenderOptions, default_settings
from capsaicin_tpu.render.traversal import make_brute_force
from capsaicin_tpu.scene import build_scene, textures
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

import np_oracle as orc

W = H = 64


def test_full_pipeline_static_2frames_matches_numpy_oracle():
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    options = RenderOptions(
        num_diffuse_bounces=1, gbuffer_feedback=False, taa=False, eaw5=True
    )
    settings = default_settings()
    noise = np.asarray(textures.blue_noise_256())
    noise_dev = jnp.asarray(noise)
    state = pipeline.init_state(W, H, camera, options)

    displays = []
    for _ in range(2):
        display, state = pipeline.render_frame(
            scene, closest, any_hit, camera, state, settings, noise_dev,
            W, H, options,
        )
        displays.append(np.asarray(display))

    # independent NumPy chain
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    xs_f, ys_f = xs.reshape(-1), ys.reshape(-1)
    prev = {
        "color_history": np.zeros((H, W, 4)),
        "moments_history": np.zeros((H, W, 4)),
        "prev_depth": np.zeros((H, W)),
    }
    disocc_seen = accum_seen = False
    for fc in range(2):
        direct, albedo, nd = orc.np_direct_lighting(
            scene, camera, noise, fc, W, H
        )
        ind = orc.np_indirect_1bounce(
            scene, camera, noise, fc, xs_f, ys_f, W, H
        ).reshape(H, W, 3)
        gathered = orc.np_spatial_gather(
            ind, nd,
            float(settings.gather_normal_sigma),
            float(settings.gather_depth_sigma),
            float(settings.gather_luma_sigma),
        )
        c4, m4 = orc.np_svgf_accumulate_static(
            gathered, nd, prev, fc, float(settings.temporal_upscale_feedback)
        )
        den = orc.np_denoise(
            c4, nd, m4,
            float(settings.eaw_normal_sigma),
            float(settings.eaw_depth_sigma),
            float(settings.eaw_luma_sigma),
            eaw5=True, use_variance=True,
        )
        combined = den[..., :3] * albedo + direct
        want = np.power(np.clip(combined, 0.0, None), 1.0 / 2.2)

        rmse = float(np.sqrt(np.mean((displays[fc] - want) ** 2)))
        assert rmse <= 1e-3, f"frame {fc}: full-pipeline display RMSE {rmse}"

        if fc == 1:
            # non-vacuousness: frame 1 must have both accumulating lanes
            # (history length 2) and disoccluded lanes (reset to 1)
            accum_seen = bool(np.any(m4[..., 3] >= 2.0))
            fg = nd["depth"] > 1e-5
            disocc_seen = bool(np.any(fg & (m4[..., 3] == 1.0)))
        prev = {
            "color_history": c4,
            "moments_history": m4,
            "prev_depth": nd["depth"],
        }

    assert accum_seen, "no lane accumulated history at frame 1"
    assert disocc_seen, "no foreground lane disoccluded at frame 1"


def test_full_pipeline_moving_taa_matches_numpy_oracle():
    """One frame rendered with a camera that MOVED since the previous frame
    (prev state carries synthetic nonzero histories + a real previous depth
    field): exercises the moving reprojection fetch, the 5% closest-depth
    disocclusion against the reprojected point fetch, velocity-adaptive TAA
    with the YCoCg AABB clip, and offscreen handling — through the FINAL
    display output, RMSE <= 1e-3.

    Every foreground pixel moves >= 0.1 px (asserted), so the per-pixel
    velocity-vs-1e-3 TAA branch is deterministic in both float32 and
    float64 — the instability that keeps the static test TAA-off."""
    scene = build_scene(cornell_box())
    cam_a = make_camera("cornell", W, H)
    # lateral translation: ~2 px of motion at 64^2
    cam_b = cam_a._replace(position=cam_a.position + 0.12 * cam_a.right)
    closest, any_hit = make_brute_force(scene)
    options = RenderOptions(
        num_diffuse_bounces=1, gbuffer_feedback=False, taa=True, eaw5=False
    )
    settings = default_settings()
    noise = np.asarray(textures.blue_noise_256())
    noise_dev = jnp.asarray(noise)
    fc = 1  # not 0: frame 0 blanket-resets SVGF

    # synthetic previous-frame state: smooth nonzero fields; prev depth is
    # the REAL frame-0 depth at camera A (from the independent oracle) so
    # the disocclusion test sees realistic geometry
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    hist_rgb = np.stack(
        [
            0.4 + 0.3 * np.sin(xx / 8.0),
            0.4 + 0.25 * np.cos(yy / 6.0),
            0.4 + 0.2 * np.sin((xx + yy) / 10.0),
        ],
        -1,
    )
    m1 = 0.3 + 0.2 * np.sin(xx / 7.0)
    m2f = m1 * m1 + 0.05 * (1.0 + np.cos(yy / 9.0))
    hist_len0 = 2.0 + 10.0 * (0.5 + 0.5 * np.sin(xx / 11.0) * np.cos(yy / 13.0))
    hist_var = 0.02 * (1.0 + np.sin(yy / 5.0))
    taa_rgb = np.stack(
        [
            0.35 + 0.3 * np.cos(xx / 9.0),
            0.35 + 0.25 * np.sin(yy / 8.0),
            0.35 + 0.2 * np.cos((xx - yy) / 12.0),
        ],
        -1,
    )
    _, _, nd_a = orc.np_direct_lighting(scene, cam_a, noise, 0, W, H)
    prev_depth = nd_a["depth"]

    color_hist = np.concatenate([hist_rgb, hist_var[..., None]], -1)
    moments_hist = np.stack(
        [m1, m2f, np.zeros_like(m1), hist_len0], -1
    )

    state = pipeline.init_state(W, H, cam_a, options)
    state = state._replace(
        color_history=jnp.asarray(color_hist, jnp.float32),
        moments_history=jnp.asarray(moments_hist, jnp.float32),
        combined_history=jnp.asarray(taa_rgb, jnp.float32),
        prev_nd_depth=jnp.asarray(prev_depth, jnp.float32),
        frame_count=jnp.int32(fc),
    )
    display, _ = pipeline.render_frame(
        scene, closest, any_hit, cam_b, state, settings, noise_dev,
        W, H, options,
    )
    got = np.asarray(display)

    # ---- independent NumPy chain ----
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    direct, albedo, nd = orc.np_direct_lighting(scene, cam_b, noise, fc, W, H)
    ind = orc.np_indirect_1bounce(
        scene, cam_b, noise, fc, xs.reshape(-1), ys.reshape(-1), W, H
    ).reshape(H, W, 3)
    gathered = orc.np_spatial_gather(
        ind, nd,
        float(settings.gather_normal_sigma),
        float(settings.gather_depth_sigma),
        float(settings.gather_luma_sigma),
    )
    rep = orc.np_reproject(cam_b, cam_a, nd["depth"], W, H)
    # threshold robustness: every foreground pixel moves well clear of the
    # 1e-3 px TAA static threshold
    assert float(rep["velocity"][rep["fg"]].min()) > 0.1

    packed_cm = np.concatenate(
        [color_hist[..., :3], moments_hist[..., :2], taa_rgb], -1
    )
    fetched = orc.np_fetch_history_moving(packed_cm, rep["prev_xy"], W, H)
    point = orc.np_point_fetch_moving(
        np.stack(
            [moments_hist[..., 3], orc.np_closest_depth_3x3(prev_depth)], -1
        ),
        rep["prev_xy"], W, H,
    )
    rep_fetch = dict(
        rep,
        history=fetched[..., 0:3],
        moments=fetched[..., 3:5],
        taa_history=fetched[..., 5:8],
        hist_len=point[..., 0],
        prev_closest=point[..., 1],
    )
    c4, m4, reset = orc.np_svgf_accumulate_moving(
        gathered, nd, rep_fetch, fc, float(settings.temporal_upscale_feedback)
    )
    den = orc.np_denoise(
        c4, nd, m4,
        float(settings.eaw_normal_sigma),
        float(settings.eaw_depth_sigma),
        float(settings.eaw_luma_sigma),
        eaw5=False, use_variance=True,
    )
    combined = den[..., :3] * albedo + direct
    taa_out = orc.np_taa(
        combined, rep_fetch["taa_history"], rep, nd["depth"],
        float(settings.taa_feedback),
    )
    want = np.power(np.clip(taa_out, 0.0, None), 1.0 / 2.2)

    rmse = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rmse <= 1e-3, f"moving-camera TAA display RMSE {rmse}"

    # non-vacuousness: both temporal branches taken on foreground lanes
    fg = rep["fg"]
    assert int((fg & ~reset).sum()) > 100, "no lane reused moving history"
    assert int((fg & reset).sum()) > 100, "no lane disoccluded"


def test_full_pipeline_lowres_progressive_matches_numpy_oracle():
    """The progressive configuration (LOWRES_INDIRECT / UPSCALE2X): four
    static-camera frames covering all 2x2 interleave phases through the
    half-res GI trace, the subsampled-nd spatial gather, the zero-gather 2x
    bilinear upsample, phase-masked SVGF accumulation, EAW, and combine —
    final display RMSE <= 1e-3 every frame (temporal_accumulation.hlsl:
    213-241 phase alpha, spatial_gather.hlsl:36-46 subsampled nd)."""
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    options = RenderOptions(
        num_diffuse_bounces=1, gbuffer_feedback=False, taa=False,
        eaw5=False, lowres_indirect=True,
    )
    settings = default_settings()
    noise = np.asarray(textures.blue_noise_256())
    noise_dev = jnp.asarray(noise)
    state = pipeline.init_state(W, H, camera, options)

    displays = []
    for _ in range(4):
        display, state = pipeline.render_frame(
            scene, closest, any_hit, camera, state, settings, noise_dev,
            W, H, options,
        )
        displays.append(np.asarray(display))

    w2, h2 = W // 2, H // 2
    prev = {
        "color_history": np.zeros((H, W, 4)),
        "moments_history": np.zeros((H, W, 4)),
        "prev_depth": np.zeros((H, W)),
    }
    from capsaicin_tpu.render.passes import interleave_offset

    for fc in range(4):
        ox, oy = interleave_offset(fc)
        direct, albedo, nd = orc.np_direct_lighting(
            scene, camera, noise, fc, W, H
        )
        xs, ys = np.meshgrid(np.arange(w2), np.arange(h2), indexing="xy")
        xs_f = (xs * 2 + ox).reshape(-1)
        ys_f = (ys * 2 + oy).reshape(-1)
        ind = orc.np_indirect_1bounce(
            scene, camera, noise, fc, xs_f, ys_f, W, H
        ).reshape(h2, w2, 3)
        # gather at half res with the phase-subsampled normal/depth
        nd_sub = {
            "normal": nd["normal"][oy::2, ox::2],
            "depth": nd["depth"][oy::2, ox::2],
        }
        gathered = orc.np_spatial_gather(
            ind, nd_sub,
            float(settings.gather_normal_sigma),
            float(settings.gather_depth_sigma),
            float(settings.gather_luma_sigma),
        )
        c4, m4 = orc.np_svgf_accumulate_static_lowres(
            gathered, nd, prev, fc,
            float(settings.temporal_upscale_feedback), ox, oy,
        )
        den = orc.np_denoise(
            c4, nd, m4,
            float(settings.eaw_normal_sigma),
            float(settings.eaw_depth_sigma),
            float(settings.eaw_luma_sigma),
            eaw5=False, use_variance=True,
        )
        combined = den[..., :3] * albedo + direct
        want = np.power(np.clip(combined, 0.0, None), 1.0 / 2.2)

        rmse = float(np.sqrt(np.mean((displays[fc] - want) ** 2)))
        assert rmse <= 1e-3, f"frame {fc} (phase {ox},{oy}): RMSE {rmse}"
        prev = {
            "color_history": c4,
            "moments_history": m4,
            "prev_depth": nd["depth"],
        }

    # after 4 phases every on-phase pixel accumulated at least twice
    assert float(m4[..., 3].max()) >= 2.0
