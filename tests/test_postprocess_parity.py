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
