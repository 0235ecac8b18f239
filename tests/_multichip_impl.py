"""Multichip test body, executed in a subprocess with an 8-virtual-device
CPU mesh (see test_multichip.py). Asserts the row-sharded frame step equals
the single-device render."""

import os
import sys


def main(n_dev: int) -> None:
    assert os.environ.get("JAX_PLATFORMS") == "cpu"
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    # NO persistent cache here: XLA:CPU AOT entries encode tuning flags as
    # machine features; reloading them under the 8-device SPMD config made
    # one device thread diverge and abort the collective rendezvous
    # (measured: rc=-6 with cpu_aot_loader feature-mismatch errors). The
    # cold SPMD compile (~80s) is the price of a deterministic run.

    from capsaicin_tpu.ops import lbvh
    from capsaicin_tpu.parallel import sharding as sh
    from capsaicin_tpu.render import pipeline
    from capsaicin_tpu.render.settings import RenderOptions, default_settings
    from capsaicin_tpu.render.traversal import make_traversal
    from capsaicin_tpu.scene import build_scene, textures
    from capsaicin_tpu.scene.procedural import cornell_box, make_camera

    assert len(jax.devices()) >= n_dev, jax.devices()
    width, height = 64, 8 * n_dev
    # slim options: what is under test is the sharding of every pass family
    # (traversal loop, row-sharded gathers, stencil halo exchange via TAA),
    # not the full 5-stage EAW chain whose SPMD compile alone costs ~60s
    options = RenderOptions(eaw5=False)
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
    mesh = sh.make_mesh(jax.devices()[:n_dev])
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
    print(f"multichip impl OK ({n_dev} devices)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
