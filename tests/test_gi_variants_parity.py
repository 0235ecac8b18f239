"""Image-level parity oracles for the two estimator-changing GI options.

GBUFFER_FEEDBACK (rt_indirect.hlsl:118-145) and LOWRES_INDIRECT
(rt_indirect.hlsl:53-55 interleaved 2x2 subsampling) change the *estimator*,
not just the schedule, so each gets its own independent NumPy oracle
(tests/np_oracle.py recomputes every term from scratch; only the blue-noise
table is shared). RMSE <= 1e-3 at equal spp, every interleave phase and
several feedback frames checked individually.
"""

import numpy as np
import jax.numpy as jnp

from capsaicin_tpu.render import passes
from capsaicin_tpu.render.settings import RenderOptions
from capsaicin_tpu.render.traversal import make_brute_force
from capsaicin_tpu.scene import build_scene, textures
from capsaicin_tpu.scene.procedural import cornell_box, make_camera

import np_oracle as orc

W = H = 64


def _setup():
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    noise = np.asarray(textures.blue_noise_256())
    return scene, camera, closest, any_hit, noise


def test_gi_lowres_interleave_matches_numpy_oracle():
    """LOWRES_INDIRECT traces the phase subsample (2x+ox, 2y+oy) at half
    res; the oracle renders those exact full-res pixel coords directly.
    All four interleave phases (frames 0-3) checked."""
    scene, camera, closest, any_hit, noise = _setup()
    options = RenderOptions(
        num_diffuse_bounces=1, gbuffer_feedback=False, lowres_indirect=True
    )
    noise_dev = jnp.asarray(noise)
    w2, h2 = W // 2, H // 2

    for fc in range(4):
        gb = passes.trace_primary(closest, camera, W, H, fc)
        got = np.asarray(
            passes.indirect_gi(
                scene, closest, any_hit, camera, camera, gb,
                jnp.zeros((H, W, 3)), None, noise_dev, W, H, fc, options,
            )
        )
        assert got.shape == (h2, w2, 3)

        ox, oy = passes.interleave_offset(fc)
        xs, ys = np.meshgrid(np.arange(w2), np.arange(h2), indexing="xy")
        xs = (xs * 2 + ox).reshape(-1)
        ys = (ys * 2 + oy).reshape(-1)
        want = orc.np_indirect_1bounce(
            scene, camera, noise, fc, xs, ys, W, H
        ).reshape(h2, w2, 3)

        rmse = float(np.sqrt(np.mean((got - want) ** 2)))
        assert rmse <= 1e-3, f"phase {fc}: lowres GI RMSE {rmse}"
        assert want.mean() > 0.01  # carries real indirect energy


def test_gi_feedback_matches_numpy_oracle():
    """GBUFFER_FEEDBACK reprojects bounce hits into the previous camera,
    bilinear-fetches the fp16 combined history, point-fetches prev depth,
    and reuses history for non-disoccluded lanes (terminating their NEE).
    Synthetic smooth history/depth fields drive both branches; the oracle
    recomputes projection, fp16 quantization, clamp-bilinear, and the 5%
    relative-depth disocclusion test independently."""
    scene, camera, closest, any_hit, noise = _setup()
    options = RenderOptions(num_diffuse_bounces=1, gbuffer_feedback=True)
    noise_dev = jnp.asarray(noise)

    # deterministic smooth fields: history in [0, 1.2], depth in [1.5, 7.5]
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    history = np.stack(
        [
            0.6 + 0.6 * np.sin(xx / 9.0),
            0.6 + 0.5 * np.cos(yy / 7.0),
            0.6 + 0.4 * np.sin((xx + yy) / 11.0),
        ],
        -1,
    )
    prev_depth = 4.5 + 3.0 * np.sin(xx / 13.0) * np.cos(yy / 10.0)
    prev_nd = {
        "oct": jnp.zeros((H, W, 2)),
        "inst": jnp.full((H, W), -1, jnp.int32),
        "depth": jnp.asarray(prev_depth, jnp.float32),
    }
    history_dev = jnp.asarray(history, jnp.float32)

    reused = 0
    disoccluded = 0
    for fc in range(4):
        gb = passes.trace_primary(closest, camera, W, H, fc)
        got = np.asarray(
            passes.indirect_gi(
                scene, closest, any_hit, camera, camera, gb,
                history_dev, prev_nd, noise_dev, W, H, fc, options,
            )
        )
        xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
        aux = {}
        want = orc.np_indirect_1bounce(
            scene, camera, noise, fc, xs.reshape(-1), ys.reshape(-1), W, H,
            feedback={
                "history": history,
                "prev_depth": np.asarray(prev_nd["depth"]),
                "prev_camera": camera,
            },
            aux=aux,
        ).reshape(H, W, 3)

        rmse = float(np.sqrt(np.mean((got - want) ** 2)))
        assert rmse <= 1e-3, f"frame {fc}: feedback GI RMSE {rmse}"
        reused += int(aux["reuse"].sum())
        disoccluded += int(aux["disocc"].sum())

    # the fields must actually exercise both branches or the test is vacuous
    assert reused > 100, f"history-reuse branch barely taken ({reused} lanes)"
    assert disoccluded > 100, f"disocclusion branch barely taken ({disoccluded})"


def test_gi_batched_spp_matches_numpy_oracle():
    """RenderOptions(spp=N) traces N disjoint blue-noise sample sets
    (noise_frame = frame*spp + s) in one dispatch and mean-accumulates;
    the oracle averages N independent runs with the same seeding while
    camera jitter and light animation stay at the real frame."""
    scene, camera, closest, any_hit, noise = _setup()
    spp = 3
    fc = 2
    options = RenderOptions(
        num_diffuse_bounces=1, gbuffer_feedback=False, spp=spp
    )
    noise_dev = jnp.asarray(noise)

    from capsaicin_tpu.render import pipeline
    from capsaicin_tpu.render.settings import default_settings

    state = pipeline.init_state(W, H, camera, options)
    state = state._replace(frame_count=jnp.int32(fc))
    _, _, aux = pipeline.render_frame(
        scene, closest, any_hit, camera, state, default_settings(),
        noise_dev, W, H, options, collect_aux=True,
    )
    got = np.asarray(aux.indirect_raw)

    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    want = np.zeros((H, W, 3))
    for s in range(spp):
        want += orc.np_indirect_1bounce(
            scene, camera, noise, fc, xs.reshape(-1), ys.reshape(-1), W, H,
            noise_frame=fc * spp + s,
        ).reshape(H, W, 3)
    want /= spp

    rmse = float(np.sqrt(np.mean((got - want) ** 2)))
    assert rmse <= 1e-3, f"spp={spp} GI RMSE {rmse}"
    assert want.mean() > 0.01
