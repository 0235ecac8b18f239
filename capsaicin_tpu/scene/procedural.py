"""Procedural test scenes.

The reference ships assets/cornell_box.obj (8 shapes: floor, ceiling, back /
left / right walls, short & tall boxes, light patch) and points its viewer at
a Sponza-class OBJ (src/viewer/main.cpp:88). We do not copy those assets;
this module constructs equivalent scenes from scratch:

  - cornell_box(): the classic 2-unit Cornell box, one mesh per surface,
    same shape roster as the reference asset
  - cornell_box_textured(): same geometry with a checkerboard diffuse
    texture on the floor (exercises the atlas + bilinear fetch path,
    BASELINE.json config 3)
  - colonnade(): a ~250k-triangle architectural stress scene
    (BASELINE.json config 4) to exercise LBVH build quality and traversal

`write_obj` serializes any mesh list through the OBJ/MTL ingest path so the
parser is exercised end-to-end by tests.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import numpy as np

from .obj_loader import Material, MeshData


def _quad(mesh: MeshData, v0, v1, v2, v3, normal, uvs=None):
    """Append a quad (two fan triangles, tinyobjloader order) with shared normal."""
    base = len(mesh.positions) // 3
    uvs = uvs or [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    for v, uv in zip((v0, v1, v2, v3), uvs):
        mesh.positions.extend(v)
        mesh.normals.extend(normal)
        mesh.texcoords.extend(uv)
    mesh.indices.extend([base, base + 1, base + 2, base, base + 2, base + 3])


def _rot_y(p, deg, cx=0.0, cz=0.0):
    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    x, y, z = p
    x -= cx
    z -= cz
    return (c * x + s * z + cx, y, -s * x + c * z + cz)


def _box(name: str, mat: Material, center, size, rot_deg=0.0) -> MeshData:
    """Axis-aligned box rotated about Y; 12 triangles, outward normals."""
    mesh = MeshData(name=name)
    mesh.material = mat
    mesh.texture_name = mat.diffuse_texname
    cx, cy, cz = center
    hx, hy, hz = size[0] / 2, size[1] / 2, size[2] / 2

    faces = [
        # (corner offsets CCW seen from outside, normal)
        ([(-hx, -hy, -hz), (-hx, hy, -hz), (hx, hy, -hz), (hx, -hy, -hz)], (0, 0, -1)),
        ([(hx, -hy, hz), (hx, hy, hz), (-hx, hy, hz), (-hx, -hy, hz)], (0, 0, 1)),
        ([(-hx, -hy, hz), (-hx, hy, hz), (-hx, hy, -hz), (-hx, -hy, -hz)], (-1, 0, 0)),
        ([(hx, -hy, -hz), (hx, hy, -hz), (hx, hy, hz), (hx, -hy, hz)], (1, 0, 0)),
        ([(-hx, hy, -hz), (-hx, hy, hz), (hx, hy, hz), (hx, hy, -hz)], (0, 1, 0)),
        ([(-hx, -hy, hz), (-hx, -hy, -hz), (hx, -hy, -hz), (hx, -hy, hz)], (0, -1, 0)),
    ]
    for corners, n in faces:
        pts = [
            _rot_y((cx + dx, cy + dy, cz + dz), rot_deg, cx, cz) for (dx, dy, dz) in corners
        ]
        nr = _rot_y(n, rot_deg)
        _quad(mesh, *pts, normal=nr)
    return mesh


WHITE = (0.58, 0.568, 0.544)
RED = (0.504, 0.052, 0.04)
GREEN = (0.156, 0.426, 0.107)


def cornell_box(floor_texture: str = "", back_texture: str = "") -> List[MeshData]:
    """Classic 2-unit Cornell box with a skylight opening.

    Shape roster follows the reference asset (walls, floor, ceiling, short &
    tall boxes) but the ceiling has a rectangular opening where the asset's
    area-light patch sits: the engine's only light is the animated
    *directional* light (lighting.h:20-33), which could never reach inside a
    fully closed box. The skylight admits it, so direct lighting, shadows and
    GI are all exercised.
    """
    m_white = Material("white", kd=WHITE)
    m_red = Material("leftWall", kd=RED)
    m_green = Material("rightWall", kd=GREEN)
    m_floor = Material("floor", kd=WHITE, diffuse_texname=floor_texture)
    m_back = Material("backWall", kd=WHITE, diffuse_texname=back_texture)

    def wall(name, mat, v0, v1, v2, v3, n):
        mesh = MeshData(name=name)
        mesh.material = mat
        mesh.texture_name = mat.diffuse_texname
        _quad(mesh, v0, v1, v2, v3, normal=n)
        return mesh

    # skylight hole footprint (the reference light patch's xz rectangle)
    hx0, hx1 = -0.24, 0.23
    hz0, hz1 = -0.22, 0.16
    y = 2.0
    ceiling = MeshData(name="ceiling")
    ceiling.material = m_white
    n_dn = (0, -1, 0)
    # four quads ringing the hole (z-strips + x-strips)
    _quad(ceiling, (-1, y, -1), (-1, y, hz0), (1, y, hz0), (1, y, -1), n_dn)
    _quad(ceiling, (-1, y, hz1), (-1, y, 1), (1, y, 1), (1, y, hz1), n_dn)
    _quad(ceiling, (-1, y, hz0), (-1, y, hz1), (hx0, y, hz1), (hx0, y, hz0), n_dn)
    _quad(ceiling, (hx1, y, hz0), (hx1, y, hz1), (1, y, hz1), (1, y, hz0), n_dn)

    meshes = [
        _box("shortBox", m_white, (0.33, 0.3, 0.37), (0.6, 0.6, 0.6), rot_deg=-17.0),
        _box("tallBox", m_white, (-0.34, 0.6, -0.29), (0.6, 1.2, 0.6), rot_deg=17.0),
        wall("leftWall", m_red, (-1, 0, 1), (-1, 2, 1), (-1, 2, -1), (-1, 0, -1), (1, 0, 0)),
        wall("backWall", m_back, (-1, 0, 1), (1, 0, 1), (1, 2, 1), (-1, 2, 1), (0, 0, -1)),
        wall("rightWall", m_green, (1, 0, -1), (1, 2, -1), (1, 2, 1), (1, 0, 1), (-1, 0, 0)),
        ceiling,
        wall("floor", m_floor, (-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1), (0, 1, 0)),
    ]
    return meshes


def _q8(img: np.ndarray) -> np.ndarray:
    """Snap to the 8-bit grid: these stand in for PNG files, whose pixels
    are always k/255 (and which makes scene.quantize_atlas lossless)."""
    return (np.round(img * 255.0) / np.float32(255.0)).astype(np.float32)


def checker_texture(size: int = 128, tiles: int = 8) -> np.ndarray:
    """[size,size,4] checkerboard in [0,1] (display-referred, like a PNG)."""
    ax = np.arange(size)
    cell = (ax[:, None] * tiles // size + ax[None, :] * tiles // size) % 2
    img = np.where(cell[..., None] == 0, 0.9, 0.25).astype(np.float32)
    img = np.repeat(img, 3, axis=-1)
    return _q8(np.concatenate([img, np.ones((size, size, 1), np.float32)], axis=-1))


def stripe_texture(h: int = 48, w: int = 96, stripes: int = 12) -> np.ndarray:
    """[h,w,4] vertical stripes; deliberately non-square and a different
    size from checker_texture so the padded multi-texture atlas (padding +
    per-texture wrap sizes) gets exercised."""
    ax = np.arange(w)
    band = (ax * stripes // w) % 2
    img = np.where(band[None, :, None] == 0, 0.85, 0.35).astype(np.float32)
    img = np.repeat(img, 3, axis=-1)
    img = np.broadcast_to(img, (h, w, 3)).copy()
    return _q8(np.concatenate([img, np.ones((h, w, 1), np.float32)], axis=-1))


def cornell_box_textured() -> Tuple[List[MeshData], dict]:
    meshes = cornell_box(floor_texture="checker.png")
    return meshes, {"checker.png": checker_texture()}


def cornell_box_multitextured() -> Tuple[List[MeshData], dict]:
    """Two textures of DIFFERENT sizes (128x128 checker floor + 48x96
    striped back wall): exercises atlas padding and per-texture wrap."""
    meshes = cornell_box(floor_texture="checker.png", back_texture="stripes.png")
    return meshes, {"checker.png": checker_texture(), "stripes.png": stripe_texture()}


def _uv_sphere(name: str, mat: Material, center, radius, nu: int, nv: int) -> MeshData:
    mesh = MeshData(name=name)
    mesh.material = mat
    cx, cy, cz = center
    base = 0
    for i in range(nv):
        for j in range(nu):
            quad_idx = []
            for (di, dj) in ((0, 0), (0, 1), (1, 1), (1, 0)):
                theta = math.pi * (i + di) / nv
                phi = 2 * math.pi * (j + dj) / nu
                nx = math.sin(theta) * math.cos(phi)
                ny = math.cos(theta)
                nz = math.sin(theta) * math.sin(phi)
                mesh.positions.extend((cx + radius * nx, cy + radius * ny, cz + radius * nz))
                mesh.normals.extend((nx, ny, nz))
                mesh.texcoords.extend(((j + dj) / nu, (i + di) / nv))
            quad_idx = [base, base + 1, base + 2, base, base + 2, base + 3]
            mesh.indices.extend(quad_idx)
            base += 4
    return mesh


def colonnade(target_tris: int = 250_000, seed: int = 42) -> List[MeshData]:
    """A hall of columns + spheres + floor, ~target_tris triangles total."""
    rng = np.random.default_rng(seed)
    m_stone = Material("stone", kd=(0.6, 0.58, 0.55))
    meshes: List[MeshData] = []

    # floor + walls: an open-air hall 40 x 8 x 20 (no roof — the engine's
    # only light is the directional sun, lighting.h:20-33)
    room = MeshData(name="room")
    room.material = m_stone
    _quad(room, (-20, 0, -10), (20, 0, -10), (20, 0, 10), (-20, 0, 10), (0, 1, 0))
    _quad(room, (-20, 0, 10), (20, 0, 10), (20, 8, 10), (-20, 8, 10), (0, 0, -1))
    _quad(room, (-20, 0, -10), (-20, 8, -10), (20, 8, -10), (20, 0, -10), (0, 0, 1))
    _quad(room, (-20, 0, -10), (-20, 0, 10), (-20, 8, 10), (-20, 8, -10), (1, 0, 0))
    _quad(room, (20, 0, -10), (20, 8, -10), (20, 8, 10), (20, 0, 10), (-1, 0, 0))
    meshes.append(room)

    budget = target_tris - 10
    # roof beams: shadow stripes across the hall (the sun is the only light)
    for k in range(13):
        x = -18 + k * 3.0
        meshes.append(_box(f"beam{k}", m_stone, (x, 7.8, 0), (1.6, 0.4, 20.0)))
        budget -= 12
    # columns: boxes are cheap (12 tris); spheres carry the triangle count
    for k in range(16):
        x = -18 + (k % 8) * 5.0
        z = -6 if k < 8 else 6
        meshes.append(_box(f"column{k}", m_stone, (x, 2.5, z), (0.8, 5.0, 0.8)))
        budget -= 12

    sphere_tris = 2 * 48 * 48
    n_spheres = max(1, budget // sphere_tris)
    placed = 0
    while placed < n_spheres:
        x = float(rng.uniform(-18, 18))
        z = float(rng.uniform(-8, 8))
        # keep the camera corner clear (camera_preset "colonnade")
        if x < -12 and z < -4:
            continue
        r = float(rng.uniform(0.4, 1.1))
        y = float(rng.uniform(r, 6.0))
        meshes.append(_uv_sphere(f"sphere{placed}", m_stone, (x, y, z), r, 48, 48))
        placed += 1
    return meshes


def colonnade_textured(
    target_tris: int = 250_000, seed: int = 42
) -> Tuple[List[MeshData], dict]:
    """Sponza-class ingest scene: the colonnade at full triangle count with
    THREE materials, two of them textured (checker floor/walls, striped
    spheres, plain stone beams/columns). The reference viewer points at
    sponza.obj (src/viewer/main.cpp:88) — a ~260k-tri multi-material
    textured OBJ; this is the equivalent stress case for the OBJ/MTL/PNG
    ingest path (asset_load_system.cpp:40-160) built from scratch."""
    meshes = colonnade(target_tris, seed)
    m_floor = Material(
        "stone_floor", kd=(0.6, 0.58, 0.55), diffuse_texname="checker.png"
    )
    m_marble = Material(
        "marble", kd=(0.62, 0.6, 0.58), diffuse_texname="stripes.png"
    )
    for mesh in meshes:
        if mesh.name == "room":
            mesh.material = m_floor
            mesh.texture_name = m_floor.diffuse_texname
        elif mesh.name.startswith("sphere"):
            mesh.material = m_marble
            mesh.texture_name = m_marble.diffuse_texname
    return meshes, {
        "checker.png": checker_texture(),
        "stripes.png": stripe_texture(),
    }


def write_obj(path: str, meshes: List[MeshData], mtl_name: Optional[str] = None):
    """Serialize meshes to OBJ + MTL (exercises the ingest path)."""
    mtl_name = mtl_name or os.path.splitext(os.path.basename(path))[0] + ".mtl"
    mtl_path = os.path.join(os.path.dirname(path), mtl_name)
    mats = {}
    for mesh in meshes:
        if mesh.material and mesh.material.name not in mats:
            mats[mesh.material.name] = mesh.material
    with open(mtl_path, "w") as f:
        for mat in mats.values():
            f.write(f"newmtl {mat.name}\n")
            f.write(f"Kd {mat.kd[0]:.6f} {mat.kd[1]:.6f} {mat.kd[2]:.6f}\n")
            if any(mat.ke):
                f.write(f"Ke {mat.ke[0]} {mat.ke[1]} {mat.ke[2]}\n")
            if mat.diffuse_texname:
                f.write(f"map_Kd {mat.diffuse_texname}\n")
            f.write("\n")
    with open(path, "w") as f:
        f.write(f"mtllib {mtl_name}\n")
        v_off = n_off = t_off = 1
        for mesh in meshes:
            f.write(f"o {mesh.name}\n")
            pos = np.asarray(mesh.positions).reshape(-1, 3)
            nrm = np.asarray(mesh.normals).reshape(-1, 3)
            uv = np.asarray(mesh.texcoords).reshape(-1, 2)
            for p in pos:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            for n in nrm:
                f.write(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}\n")
            for t in uv:
                f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
            if mesh.material:
                f.write(f"usemtl {mesh.material.name}\n")
            idx = np.asarray(mesh.indices).reshape(-1, 3)
            for tri in idx:
                toks = [
                    f"{v_off + i}/{t_off + i}/{n_off + i}" for i in tri
                ]
                f.write("f " + " ".join(toks) + "\n")
            v_off += pos.shape[0]
            n_off += nrm.shape[0]
            t_off += uv.shape[0]


def camera_preset(name: str = "cornell"):
    """Camera poses for the procedural scenes (the reference's default pose,
    camera_system.cpp:25-33, targets its own viewer scene)."""
    import jax.numpy as jnp

    from ..ops.camera import Camera

    if name == "cornell":
        return dict(
            position=jnp.array([0.0, 1.0, -3.6], jnp.float32),
            right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
            forward=jnp.array([0.0, 0.0, 1.0], jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            focal_length=0.040,
        )
    if name == "colonnade":
        f = np.array([0.85, -0.22, 0.48])
        f = f / np.linalg.norm(f)
        up0 = np.array([0.0, 1.0, 0.0])
        r = np.cross(up0, f)
        r /= np.linalg.norm(r)
        u = np.cross(f, r)
        return dict(
            position=jnp.array([-17.5, 6.0, -7.5], jnp.float32),
            right=jnp.asarray(r, jnp.float32),
            forward=jnp.asarray(f, jnp.float32),
            up=jnp.asarray(u, jnp.float32),
        )
    raise ValueError(name)


def make_camera(name: str, width: int, height: int):
    import jax.numpy as jnp

    from ..ops.camera import Camera

    pose = camera_preset(name)
    focal = pose.pop("focal_length", 0.016)
    aspect = height / width
    return Camera(
        focal_length=jnp.float32(focal),
        sensor_size=jnp.array([0.036, 0.036 * aspect], jnp.float32),
        **pose,
    )
