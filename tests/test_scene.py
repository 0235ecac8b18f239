"""Scene ingest: OBJ parsing, dedup, Scene pytree assembly."""

import os

import numpy as np

from capsaicin_tpu.scene import build_scene, load_obj
from capsaicin_tpu.scene.procedural import (
    cornell_box,
    cornell_box_textured,
    colonnade,
    write_obj,
)
from capsaicin_tpu.scene.scene import load_scene_obj


def test_merge_scenes_matches_combined_build():
    """merge_scenes(A, B) equals building one scene from both mesh lists
    (offset fixups for the pooled streams, mesh table, and tri_mesh)."""
    from capsaicin_tpu.scene import merge_scenes

    meshes_a = cornell_box()
    meshes_b = colonnade(target_tris=200)
    merged = merge_scenes(build_scene(meshes_a), build_scene(meshes_b))
    combined = build_scene(meshes_a + meshes_b)
    for field in combined._fields:
        np.testing.assert_array_equal(
            getattr(merged, field), getattr(combined, field), err_msg=field)


def test_merge_scenes_textured_atlas_offsets():
    """Texture indices shift by the first atlas's size; placeholder atlases
    (untextured scenes) are dropped rather than concatenated."""
    from capsaicin_tpu.scene import merge_scenes

    meshes_t, images = cornell_box_textured()
    plain = build_scene(cornell_box())
    textured = build_scene(meshes_t, images)

    m1 = merge_scenes(plain, textured)
    assert m1.atlas.shape[0] == textured.atlas.shape[0]
    np.testing.assert_array_equal(
        m1.mesh_texture[plain.num_meshes:], textured.mesh_texture)

    m2 = merge_scenes(textured, textured)
    assert m2.atlas.shape[0] == 2 * textured.atlas.shape[0]
    shifted = np.where(
        textured.mesh_texture >= 0,
        textured.mesh_texture + textured.atlas.shape[0], -1)
    np.testing.assert_array_equal(m2.mesh_texture[textured.num_meshes:], shifted)
    assert m2.num_triangles == 2 * textured.num_triangles


def test_add_scene_two_objs_render(tmp_path):
    """Reference parity: two sequential OBJ loads accumulate into the
    session (repeated LoadSceneFromOBJ, capsaicin.cpp:65-73) and both are
    visible in the render."""
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene.procedural import make_camera

    import dataclasses

    box = cornell_box()
    # second asset: the tall box meshes only, shifted toward the camera so
    # they occlude part of the first scene
    def shifted(m):
        pos = (np.asarray(m.positions, np.float32).reshape(-1, 3)
               + np.float32([0.4, 0, 0.3]))
        return dataclasses.replace(m, positions=list(pos.reshape(-1)))

    extra = [shifted(m) for m in box if m.name == "tallBox"]
    p1 = os.path.join(tmp_path, "a.obj")
    p2 = os.path.join(tmp_path, "b.obj")
    write_obj(p1, box)
    write_obj(p2, extra)

    opts = RenderOptions(taa=False, eaw5=False, denoise=False, gather=False,
                         num_diffuse_bounces=0)
    sess = RenderSession(width=32, height=32, options=opts, traversal="brute")
    sess.set_camera(make_camera("cornell", 32, 32))
    sess.add_scene(load_scene_obj(p1))  # first add == set_scene
    img1 = sess.render()
    sess.add_scene(load_scene_obj(p2))
    assert sess.scene_host.num_meshes == len(box) + len(extra)
    img2 = sess.render()
    assert np.all(np.isfinite(img2))
    # the added geometry changes the image
    assert np.abs(img2 - img1).max() > 1e-3

    # and equals a single combined load
    ref = RenderSession(width=32, height=32, options=opts, traversal="brute")
    ref.set_camera(make_camera("cornell", 32, 32))
    ref.set_scene(build_scene(box + extra))
    np.testing.assert_allclose(img2, ref.render(), atol=1e-5)


def test_obj_roundtrip_cornell(tmp_path):
    meshes = cornell_box()
    path = os.path.join(tmp_path, "cornell_box.obj")
    write_obj(path, meshes)
    loaded, materials = load_obj(path)
    assert len(loaded) == len(meshes) == 7
    names = [m.name for m in loaded]
    assert "floor" in names and "tallBox" in names and "ceiling" in names
    # triangle counts survive the round trip
    for a, b in zip(meshes, loaded):
        assert len(a.indices) == len(b.indices)
    assert "leftWall" in materials
    np.testing.assert_allclose(materials["leftWall"].kd, (0.504, 0.052, 0.04))


def test_dedup_shares_vertices(tmp_path):
    """A quad written as 2 triangles with 4 unique corners dedups to 4 verts."""
    path = os.path.join(tmp_path, "quad.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
        f.write("vn 0 0 1\n")
        f.write("f 1//1 2//1 3//1\nf 1//1 3//1 4//1\n")
    meshes, _ = load_obj(path)
    assert len(meshes) == 1
    assert len(meshes[0].positions) // 3 == 4  # deduplicated
    assert len(meshes[0].indices) == 6


def test_negative_and_missing_indices(tmp_path):
    path = os.path.join(tmp_path, "neg.obj")
    with open(path, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        f.write("f -3 -2 -1\n")
    meshes, _ = load_obj(path)
    assert len(meshes[0].indices) == 3
    # missing normals -> zeros; missing texcoords -> zeros
    assert meshes[0].normals == [0.0] * 9
    assert meshes[0].texcoords == [0.0] * 6


def test_build_scene_offsets():
    scene = build_scene(cornell_box())
    assert scene.num_meshes == 7
    # 2 boxes(12 each) + 4 walls+floor(2 each) + ceiling ring(8)
    assert scene.num_triangles == 12 + 12 + 4 * 2 + 8
    # mesh offset tables are consistent
    assert scene.mesh_first_vertex[0] == 0
    for i in range(1, scene.num_meshes):
        assert (
            scene.mesh_first_vertex[i]
            == scene.mesh_first_vertex[i - 1] + scene.mesh_vertex_count[i - 1]
        )
        assert (
            scene.mesh_first_index[i]
            == scene.mesh_first_index[i - 1] + scene.mesh_index_count[i - 1]
        )
    # flattened tris agree with indexed fetch
    t = 0
    tris = scene.triangles()
    for mesh_id in range(scene.num_meshes):
        fi = scene.mesh_first_index[mesh_id]
        fv = scene.mesh_first_vertex[mesh_id]
        for k in range(scene.mesh_index_count[mesh_id] // 3):
            i0 = scene.indices[fi + 3 * k] + fv
            np.testing.assert_allclose(tris[t, 0], scene.positions[i0])
            assert scene.tri_mesh[t] == mesh_id
            t += 1


def test_untextured_mesh_gets_invalid_id():
    scene = build_scene(cornell_box())
    assert np.all(scene.mesh_texture == -1)  # INVALID_ID analog


def test_textured_scene_atlas():
    meshes, textures = cornell_box_textured()
    scene = build_scene(meshes, textures)
    floor = [i for i, m in enumerate(meshes) if m.name == "floor"][0]
    assert scene.mesh_texture[floor] >= 0
    assert scene.atlas.shape[0] >= 1
    assert scene.atlas.shape[3] == 16  # quad-packed bilinear corners
    # quad packing invariant: +x block at x equals base block at (x+1) % w
    k = scene.mesh_texture[floor]
    w = int(scene.atlas_size[k, 0])
    np.testing.assert_array_equal(
        scene.atlas[k, 0, : w - 1, 4:8], scene.atlas[k, 0, 1:w, 0:4]
    )
    np.testing.assert_array_equal(
        scene.atlas[k, 0, w - 1, 4:8], scene.atlas[k, 0, 0, 0:4]
    )


def test_colonnade_tri_count():
    meshes = colonnade(target_tris=50_000)
    scene = build_scene(meshes)
    assert 40_000 <= scene.num_triangles <= 60_000


def test_load_scene_obj_end_to_end(tmp_path):
    meshes = cornell_box()
    path = os.path.join(tmp_path, "cb.obj")
    write_obj(path, meshes)
    scene = load_scene_obj(path)
    assert scene.num_triangles == 40



def _numpy_bilinear_wrap(img, uv):
    """Independent wrap-mode bilinear reference shared by the atlas tests."""
    h, w = img.shape[:2]
    xy = uv * np.array([w, h], np.float32) - 0.5
    ix = np.floor(xy[:, 0]).astype(int)
    iy = np.floor(xy[:, 1]).astype(int)
    fx = (xy[:, 0] - ix)[:, None]
    fy = (xy[:, 1] - iy)[:, None]

    def at(jx, jy):
        return img[np.mod(jy, h), np.mod(jx, w)]

    return (
        at(ix, iy) * (1 - fx) * (1 - fy)
        + at(ix + 1, iy) * fx * (1 - fy)
        + at(ix, iy + 1) * (1 - fx) * fy
        + at(ix + 1, iy + 1) * fx * fy
    )


def test_sample_atlas_matches_numpy_bilinear():
    """The quad-packed one-gather fetch must equal an independent NumPy
    wrap-mode bilinear sampler (SampleLevel on the bindless array,
    scene.h:58)."""
    import jax.numpy as jnp

    from capsaicin_tpu.render.shading import sample_atlas

    rng = np.random.default_rng(3)
    img = rng.random((6, 9, 4)).astype(np.float32)  # h=6, w=9 (non-square)
    meshes, _ = cornell_box_textured()
    scene = build_scene(meshes, {"checker.png": img})
    k = int(scene.mesh_texture[[i for i, m in enumerate(meshes)
                                if m.texture_name][0]])

    uv = rng.random((257, 2)).astype(np.float32) * 2.0 - 0.5  # incl. wraps
    got = np.asarray(
        sample_atlas(
            jnp.asarray(scene.atlas), jnp.asarray(scene.atlas_size),
            jnp.full((257,), k, jnp.int32), jnp.asarray(uv),
        )
    )

    want = _numpy_bilinear_wrap(img, uv)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_multitexture_atlas_padding_and_wrap():
    """Two textures of different sizes in one padded atlas: per-texture
    sizes recorded, the smaller texture's quad-packed corners wrap at ITS
    size (not the padded atlas size), and the bilinear fetch matches an
    independent NumPy sampler for BOTH textures."""
    import jax.numpy as jnp

    from capsaicin_tpu.render.shading import sample_atlas
    from capsaicin_tpu.scene.procedural import cornell_box_multitextured

    meshes, textures = cornell_box_multitextured()
    scene = build_scene(meshes, textures)
    names = [m.texture_name for m in meshes if m.texture_name]
    assert sorted(set(names)) == ["checker.png", "stripes.png"]
    assert scene.atlas.shape[0] == 2
    # padded atlas is the max size; the smaller texture records its own
    sizes = {tuple(s) for s in np.asarray(scene.atlas_size)}
    assert (128, 128) in sizes and (96, 48) in sizes

    rng = np.random.default_rng(11)
    uv = rng.random((97, 2)).astype(np.float32) * 1.6 - 0.3
    for name, img in textures.items():
        k = next(
            int(scene.mesh_texture[i]) for i, m in enumerate(meshes)
            if m.texture_name == name
        )
        got = np.asarray(
            sample_atlas(
                jnp.asarray(scene.atlas), jnp.asarray(scene.atlas_size),
                jnp.full((97,), k, jnp.int32), jnp.asarray(uv),
            )
        )
        want = _numpy_bilinear_wrap(img, uv)
        np.testing.assert_allclose(got, want, atol=2e-6, err_msg=name)


def test_multitexture_render():
    """A frame over the two-texture scene renders finite and picks up both
    textures' albedo (back wall differs from an untextured render)."""
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene.procedural import cornell_box_multitextured, make_camera

    meshes, textures = cornell_box_multitextured()
    s = RenderSession(width=32, height=32, traversal="brute",
                      options=RenderOptions(eaw5=False, taa=False))
    s.set_camera(make_camera("cornell", 32, 32))
    s.set_scene(build_scene(meshes, textures))
    img = s.render()
    assert np.all(np.isfinite(img))
    assert img.std() > 0.01  # textured variation present
