"""rgba8-packed uint32 atlas (scene.quantize_atlas) vs the f32 quad atlas.

The reference samples R8G8B8A8_UNORM textures (texture_system.cpp:58-66),
so the u32 atlas is the native-precision representation; on TPU it quarters
the bilinear gather's row bytes. For any 8-bit-grid source (every PNG, and
the procedural textures which quantize at build) the two paths must agree
exactly.
"""

import numpy as np

from capsaicin_tpu.scene import build_scene
from capsaicin_tpu.scene.procedural import (
    cornell_box_multitextured,
    cornell_box_textured,
    make_camera,
)
from capsaicin_tpu.scene.scene import merge_scenes, quantize_atlas


def _rand_8bit_img(rng, h, w):
    return (rng.integers(0, 256, (h, w, 4)) / np.float32(255.0)).astype(np.float32)


def test_quantize_atlas_packs_and_is_idempotent():
    meshes, textures = cornell_box_multitextured()
    scene = build_scene(meshes, textures)
    q = quantize_atlas(scene)
    assert q.atlas.dtype == np.uint32
    assert q.atlas.shape == scene.atlas.shape[:3] + (4,)
    # idempotent
    assert quantize_atlas(q).atlas is q.atlas
    # unpacking the packed corners recovers the f32 atlas exactly
    # (procedural textures are 8-bit grid)
    for c in range(4):
        u = q.atlas[..., c]
        got = np.stack(
            [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF, (u >> 24) & 0xFF], -1
        ).astype(np.float32) / np.float32(255.0)
        np.testing.assert_array_equal(got, scene.atlas[..., 4 * c : 4 * c + 4])


def test_sample_atlas_u32_equals_f32_multitexture():
    """Random 8-bit images of two different sizes (exercises padding and
    per-texture wrap), random uv incl. out-of-range wraps and random tex
    ids: the u32 fetch must equal the f32 fetch bit-for-bit."""
    import jax.numpy as jnp

    from capsaicin_tpu.render.shading import sample_atlas

    rng = np.random.default_rng(11)
    meshes, _ = cornell_box_multitextured()
    textures = {
        "checker.png": _rand_8bit_img(rng, 13, 7),
        "stripes.png": _rand_8bit_img(rng, 5, 17),
    }
    scene = build_scene(meshes, textures)
    q = quantize_atlas(scene)

    n = 513
    uv = (rng.random((n, 2)).astype(np.float32)) * 3.0 - 1.0
    tid = rng.integers(0, scene.atlas.shape[0], n).astype(np.int32)
    a = np.asarray(
        sample_atlas(jnp.asarray(scene.atlas), jnp.asarray(scene.atlas_size),
                     jnp.asarray(tid), jnp.asarray(uv))
    )
    b = np.asarray(
        sample_atlas(jnp.asarray(q.atlas), jnp.asarray(q.atlas_size),
                     jnp.asarray(tid), jnp.asarray(uv))
    )
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-7)


def test_textured_render_u32_equals_f32():
    """Full 9-pass frame on the textured Cornell box: the u32-atlas scene
    renders the same image as the f32-atlas scene."""
    from capsaicin_tpu.render import RenderOptions, RenderSession

    meshes, textures = cornell_box_textured()
    scene = build_scene(meshes, textures)

    imgs = []
    for s_scene in (scene, quantize_atlas(scene)):
        s = RenderSession(width=32, height=32, traversal="brute",
                          options=RenderOptions(eaw5=False))
        s.set_camera(make_camera("cornell", 32, 32))
        s.set_scene(s_scene)
        imgs.append(np.asarray(s.render()))
    assert np.all(np.isfinite(imgs[0]))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=0, atol=1e-5)


def test_merge_scenes_u32_atlases():
    meshes, textures = cornell_box_multitextured()
    a = quantize_atlas(build_scene(meshes, textures))
    b = quantize_atlas(build_scene(meshes, textures))
    m = merge_scenes(a, b)
    assert m.atlas.dtype == np.uint32
    assert m.atlas.shape[0] == a.atlas.shape[0] + b.atlas.shape[0]
    # b's texture ids shifted past a's atlas entries
    nb = b.mesh_texture >= 0
    np.testing.assert_array_equal(
        m.mesh_texture[a.num_meshes:][nb], b.mesh_texture[nb] + a.atlas.shape[0]
    )
