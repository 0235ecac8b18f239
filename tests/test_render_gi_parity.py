"""Image-level GI parity oracle (BASELINE.md accuracy north star).

An independent NumPy renderer (tests/np_oracle.py) implements the full
1-bounce indirect-GI estimator of rt_indirect.hlsl:91-174 — blue-noise 4x4
sampling with golden-ratio rotation and frame*25+bounce seeding, cosine
hemisphere mapping, throughput = brdf*cos/pdf, per-bounce NEE against the
animated directional light, sky on bounce miss — and the framework's raw
indirect output must match it at equal spp to RMSE <= 1e-3 (single frame
AND accumulated).

Only the blue-noise *table* is shared (both sides index it independently);
every estimator term — sample lookup, hemisphere mapping, pdf, throughput,
NEE, seeding — is recomputed there from scratch, so any drift in one of
them fails the test. The estimator-changing options (GBUFFER_FEEDBACK,
LOWRES_INDIRECT) have their own oracles in test_gi_variants_parity.py.
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


def test_gi_1bounce_matches_numpy_oracle():
    scene = build_scene(cornell_box())
    camera = make_camera("cornell", W, H)
    closest, any_hit = make_brute_force(scene)
    options = RenderOptions(num_diffuse_bounces=1, gbuffer_feedback=False)
    noise = np.asarray(textures.blue_noise_256())
    noise_dev = jnp.asarray(noise)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)

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
        want = orc.np_indirect_1bounce(
            scene, camera, noise, fc, xs, ys, W, H
        ).reshape(H, W, 3)
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
