"""Native C++ OBJ loader: builds, matches the Python reference parser."""

import os

import numpy as np
import pytest

from capsaicin_tpu import native
from capsaicin_tpu.scene.obj_loader import load_obj
from capsaicin_tpu.scene.procedural import colonnade, cornell_box, write_obj


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")
    return native.get_lib()


def _compare(tmp_path, meshes, name):
    path = os.path.join(tmp_path, name)
    write_obj(path, meshes)
    py_meshes, _ = load_obj(path, force_python=True)
    nat = native.load_obj_native(path)
    assert nat is not None
    nat_meshes, mtllib = nat
    assert mtllib.endswith(".mtl")
    assert len(nat_meshes) == len(py_meshes)
    for a, b in zip(py_meshes, nat_meshes):
        assert a.name == b.name
        np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)
        np.testing.assert_allclose(a.normals, b.normals, atol=1e-6)
        np.testing.assert_allclose(a.texcoords, b.texcoords, atol=1e-6)
        assert a.indices == b.indices
        assert (a.material.name if a.material else "") == b._material_name


def test_native_matches_python_cornell(lib, tmp_path):
    _compare(tmp_path, cornell_box(), "cornell.obj")


def test_native_matches_python_colonnade(lib, tmp_path):
    _compare(tmp_path, colonnade(target_tris=20000), "col.obj")


def test_native_fast_path_in_load_obj(lib, tmp_path):
    """Above the size threshold load_obj must produce identical output via
    the native path (exercised implicitly: results equal either way)."""
    meshes = colonnade(target_tris=30000)
    path = os.path.join(tmp_path, "big.obj")
    write_obj(path, meshes)
    assert os.path.getsize(path) > 1 << 20
    auto_meshes, mats = load_obj(path)
    py_meshes, _ = load_obj(path, force_python=True)
    assert len(auto_meshes) == len(py_meshes)
    total_auto = sum(len(m.indices) for m in auto_meshes)
    total_py = sum(len(m.indices) for m in py_meshes)
    assert total_auto == total_py
    assert "stone" in mats


def test_obj_to_image_end_to_end(tmp_path):
    """The full user journey of the reference viewer (main.cpp:84-89):
    an OBJ file on disk -> LoadSceneFromOBJ analog -> rendered frame."""
    from capsaicin_tpu.render import RenderOptions, RenderSession
    from capsaicin_tpu.scene import load_scene_obj
    from capsaicin_tpu.scene.procedural import make_camera

    path = os.path.join(tmp_path, "cb.obj")
    write_obj(path, cornell_box())
    scene = load_scene_obj(path)
    assert scene.num_triangles == 40

    s = RenderSession(
        width=32, height=32, traversal="brute",
        options=RenderOptions(eaw5=False),
    )
    s.set_camera(make_camera("cornell", 32, 32))
    s.set_scene(scene)
    img = s.render()
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01  # a lit scene, not black


def test_sponza_scale_textured_obj_e2e(lib, tmp_path):
    """Sponza-class ingest (VERDICT #5): a >=200k-tri, multi-material,
    textured OBJ+MTL+PNG set on disk, parsed by the native C++ loader,
    checked against the Python reference parser, and built into a Scene
    with a real multi-texture atlas — the scale the reference viewer's
    sponza.obj target exercises (main.cpp:88, asset_load_system.cpp:40-160)."""
    import time

    from PIL import Image

    from capsaicin_tpu.scene import load_scene_obj
    from capsaicin_tpu.scene.procedural import colonnade_textured

    meshes, images = colonnade_textured(target_tris=250_000)
    path = os.path.join(tmp_path, "sponza_scale.obj")
    write_obj(path, meshes)
    for name, img in images.items():
        arr = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
        Image.fromarray(arr, "RGBA").save(os.path.join(tmp_path, name))
    assert os.path.getsize(path) > 20 << 20  # genuinely Sponza-sized text

    t0 = time.perf_counter()
    nat = native.load_obj_native(path)
    t_native = time.perf_counter() - t0
    assert nat is not None
    nat_meshes, _ = nat
    total = sum(len(m.indices) for m in nat_meshes) // 3
    assert total >= 200_000, f"only {total} tris"

    # native vs Python parity at full scale: mesh roster, triangle count,
    # and exact vertex data on a head/tail sample of meshes (the full
    # per-float comparison at 250k tris is covered at 20k/30k above)
    t0 = time.perf_counter()
    py_meshes, py_mats = load_obj(path, force_python=True)
    t_python = time.perf_counter() - t0
    assert [m.name for m in nat_meshes] == [m.name for m in py_meshes]
    assert sum(len(m.indices) for m in py_meshes) // 3 == total
    for a, b in list(zip(py_meshes, nat_meshes))[:3] + list(zip(py_meshes, nat_meshes))[-3:]:
        np.testing.assert_allclose(a.positions, b.positions, atol=1e-6)
        assert a.indices == b.indices
        assert (a.material.name if a.material else "") == b._material_name
    assert {"stone", "stone_floor", "marble"} <= set(py_mats)

    # full ingest: OBJ -> materials -> PNG textures -> atlas -> Scene
    scene = load_scene_obj(path, texture_dir=str(tmp_path))
    assert scene.num_triangles >= 200_000
    assert scene.atlas.shape[0] == 2  # checker + stripes
    assert scene.atlas.shape[1] > 1 and scene.atlas.shape[2] > 1
    # untextured (-1) plus both atlas entries referenced by meshes
    assert len(set(np.asarray(scene.mesh_texture).tolist())) == 3

    print(f"\nnative parse: {t_native*1e3:.0f} ms, python parse: {t_python*1e3:.0f} ms")
