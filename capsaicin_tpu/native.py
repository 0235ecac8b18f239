"""ctypes bindings for the native C++ runtime components.

The native library (native/libcapsaicin_native.so) implements the host-side
hot paths the reference keeps in C++ — currently the OBJ geometry loader
with hash-map dedup (see native/objloader.cpp, replacing the reference's
asset_load_system.cpp:40-160). Built on demand with `make`; all callers fall
back to the pure-Python implementations when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcapsaicin_native.so")

_lib = None
_lib_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.caps_load_obj.restype = ctypes.c_void_p
    lib.caps_load_obj.argtypes = [ctypes.c_char_p]
    lib.caps_free.argtypes = [ctypes.c_void_p]
    lib.caps_num_meshes.restype = ctypes.c_int32
    lib.caps_num_meshes.argtypes = [ctypes.c_void_p]
    lib.caps_mtllib.restype = ctypes.c_char_p
    lib.caps_mtllib.argtypes = [ctypes.c_void_p]
    for name in ("caps_mesh_name", "caps_mesh_material"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_char_p
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    for name in ("caps_mesh_vertex_count", "caps_mesh_index_count"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int32
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    for name in ("caps_mesh_positions", "caps_mesh_normals", "caps_mesh_texcoords"):
        fn = getattr(lib, name)
        fn.restype = ctypes.POINTER(ctypes.c_float)
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.caps_mesh_indices.restype = ctypes.POINTER(ctypes.c_int32)
    lib.caps_mesh_indices.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def load_obj_native(path: str):
    """Parse an OBJ with the C++ loader. Returns (meshes, mtllib_name) where
    meshes mirror scene.obj_loader.MeshData, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.caps_load_obj(path.encode())
    if not handle:
        return None
    try:
        from .scene.obj_loader import MeshData

        out: List[MeshData] = []
        n = lib.caps_num_meshes(handle)
        for i in range(n):
            vcount = lib.caps_mesh_vertex_count(handle, i)
            icount = lib.caps_mesh_index_count(handle, i)
            mesh = MeshData(name=lib.caps_mesh_name(handle, i).decode())
            mesh.positions = np.ctypeslib.as_array(
                lib.caps_mesh_positions(handle, i), (vcount * 3,)
            ).copy().tolist()
            mesh.normals = np.ctypeslib.as_array(
                lib.caps_mesh_normals(handle, i), (vcount * 3,)
            ).copy().tolist()
            mesh.texcoords = np.ctypeslib.as_array(
                lib.caps_mesh_texcoords(handle, i), (vcount * 2,)
            ).copy().tolist()
            mesh.indices = np.ctypeslib.as_array(
                lib.caps_mesh_indices(handle, i), (icount,)
            ).copy().tolist()
            mesh.texture_name = ""
            mesh._material_name = lib.caps_mesh_material(handle, i).decode()
            out.append(mesh)
        mtllib = lib.caps_mtllib(handle).decode()
        return out, mtllib
    finally:
        lib.caps_free(handle)
