"""Multi-chip sharding: the full frame step over a virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from capsaicin_tpu.ops import lbvh
from capsaicin_tpu.parallel import sharding as sh
from capsaicin_tpu.render import pipeline
from capsaicin_tpu.render.settings import RenderOptions, default_settings
from capsaicin_tpu.render.traversal import make_traversal
from capsaicin_tpu.scene import build_scene, textures
from capsaicin_tpu.scene.procedural import cornell_box, make_camera


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_frame_matches_single_device():
    n_dev = len(jax.devices())
    width, height = 64, 8 * n_dev
    options = RenderOptions()
    scene_host = build_scene(cornell_box())
    camera = make_camera("cornell", width, height)
    settings = default_settings()
    noise = jnp.asarray(textures.blue_noise_256())

    def step(scene, bvh, camera, state, settings, noise):
        closest, any_hit = make_traversal(scene, "bvh", bvh)
        return pipeline.render_frame(
            scene, closest, any_hit, camera, state, settings, noise,
            width, height, options,
        )

    # single-device reference
    scene1 = jax.device_put(scene_host)
    tris = jnp.stack([scene1.tri_v0, scene1.tri_v1, scene1.tri_v2], axis=1)
    bvh1 = lbvh.build_lbvh(tris, leaf_size=2)
    state1 = pipeline.init_state(width, height, camera, options)
    ref, ref_state = jax.jit(step)(scene1, bvh1, camera, state1, settings, noise)

    # sharded run
    mesh = sh.make_mesh()
    scene8 = sh.shard_scene(mesh, scene_host)
    bvh8 = jax.device_put(bvh1, sh.replicated(mesh))
    state8 = sh.shard_frame_state(
        mesh, pipeline.init_state(width, height, camera, options), height
    )
    step8 = sh.build_sharded_step(
        mesh, step, height, state8, (scene8, bvh8, camera, state8, settings, noise)
    )
    out, out_state = step8(scene8, bvh8, camera, state8, settings, noise)

    assert out.sharding.num_devices == n_dev
    # sharded execution reassociates float reductions; allow small drift
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
    assert int(out_state.frame_count) == 1

    # second frame runs with the carried (sharded) state
    out2, _ = step8(scene8, bvh8, camera, out_state, settings, noise)
    assert np.all(np.isfinite(np.asarray(out2)))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_graft_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))
