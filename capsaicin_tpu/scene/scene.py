"""The Scene pytree: flat device arrays describing all geometry + materials.

TPU-native replacement for the reference's pooled GPU geometry buffers
(GeometryStorage, asset_load_system.h:16-27 / asset_load_system.cpp:162-270)
and the Mesh descriptor table (data_payload.h:21-31). Instead of an ECS with
per-mesh entities, the whole scene is one frozen pytree of flat arrays:

  - pooled vertex/index streams with per-mesh offsets (exact parity with the
    reference's buffers, used by attribute interpolation)
  - a derived flattened triangle SoA (one record per triangle) that the
    intersector/BVH consume directly; `tri_mesh` replaces DXR's InstanceID
    (TLAS instances are identity transforms, tlas_system.cpp:39-58, so a
    single flattened BVH over all triangles is equivalent)
  - a padded texture atlas [N, TH, TW, 4] with per-texture sizes

All arrays are numpy on build; jax.device_put happens at session creation.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional

import numpy as np

from .obj_loader import MeshData, mesh_arrays


class Scene(NamedTuple):
    # pooled streams (reference pool parity)
    positions: np.ndarray  # [V,3] f32
    normals: np.ndarray  # [V,3] f32
    texcoords: np.ndarray  # [V,2] f32
    indices: np.ndarray  # [I] i32

    # mesh descriptor table (Mesh struct parity, data_payload.h:21-31)
    mesh_first_vertex: np.ndarray  # [M] i32
    mesh_vertex_count: np.ndarray  # [M] i32
    mesh_first_index: np.ndarray  # [M] i32
    mesh_index_count: np.ndarray  # [M] i32
    mesh_texture: np.ndarray  # [M] i32, -1 == INVALID_ID
    mesh_kd: np.ndarray  # [M,3] f32 (MTL Kd; unused by default shading)
    mesh_first_prim: np.ndarray  # [M] i32

    # flattened triangle SoA
    tri_v0: np.ndarray  # [T,3]
    tri_v1: np.ndarray
    tri_v2: np.ndarray
    tri_n0: np.ndarray  # [T,3]
    tri_n1: np.ndarray
    tri_n2: np.ndarray
    tri_t0: np.ndarray  # [T,2]
    tri_t1: np.ndarray
    tri_t2: np.ndarray
    tri_mesh: np.ndarray  # [T] i32

    # texture atlas, quad-packed: channels = 4 RGBA blocks for the (0,0),
    # (+1,0), (0,+1), (+1,+1) bilinear corners with per-texture wrap, so one
    # gather fetches a full bilinear footprint (see build_scene)
    atlas: np.ndarray  # [N,TH,TW,16] f32, or [N,TH,TW,4] u32 rgba8-packed
    #                    (see quantize_atlas); N>=1, entry 0 is the fallback
    atlas_size: np.ndarray  # [N,2] i32 (w,h)

    @property
    def num_triangles(self) -> int:
        return self.tri_v0.shape[0]

    @property
    def num_meshes(self) -> int:
        return self.mesh_first_vertex.shape[0]

    def triangles(self):
        """[T,3,3] vertex positions (for the brute-force oracle)."""
        return np.stack([self.tri_v0, self.tri_v1, self.tri_v2], axis=1)

    def bounds(self):
        lo = np.minimum(np.minimum(self.tri_v0.min(0), self.tri_v1.min(0)), self.tri_v2.min(0))
        hi = np.maximum(np.maximum(self.tri_v0.max(0), self.tri_v1.max(0)), self.tri_v2.max(0))
        return lo, hi


def build_scene(
    meshes: List[MeshData],
    textures: Optional[Dict[str, np.ndarray]] = None,
) -> Scene:
    """Assemble a Scene from per-mesh data.

    textures: name -> [H,W,4] float image (linear 0..1 *before* the gamma-2.2
    decode, which happens in the shading kernel like scene.h:59).
    """
    textures = textures or {}

    # Resolve texture indices; index 0 is reserved for the 1x1 zero fallback
    # (texture_system.cpp:47-56 loads missing textures as a single black texel,
    # but meshes with *no* texture name get INVALID_ID -> constant 0.75).
    tex_names: List[str] = []
    name_to_idx: Dict[str, int] = {}

    def tex_index(name: str) -> int:
        if not name:
            return -1
        if name not in name_to_idx:
            name_to_idx[name] = len(tex_names)
            tex_names.append(name)
        return name_to_idx[name]

    pos_list, nrm_list, uv_list, idx_list = [], [], [], []
    mfv, mvc, mfi, mic, mtex, mkd, mfp = [], [], [], [], [], [], []
    tv0, tv1, tv2 = [], [], []
    tn0, tn1, tn2 = [], [], []
    tt0, tt1, tt2 = [], [], []
    tmesh = []

    first_vertex = 0
    first_index = 0
    first_prim = 0
    for mesh_id, mesh in enumerate(meshes):
        pos, nrm, uv, idx = mesh_arrays(mesh)
        pos_list.append(pos)
        nrm_list.append(nrm)
        uv_list.append(uv)
        idx_list.append(idx)
        mfv.append(first_vertex)
        mvc.append(pos.shape[0])
        mfi.append(first_index)
        mic.append(idx.shape[0])
        mtex.append(tex_index(mesh.texture_name))
        mkd.append(mesh.material.kd if mesh.material else (0.75, 0.75, 0.75))
        mfp.append(first_prim)

        tris = idx.reshape(-1, 3)
        tv0.append(pos[tris[:, 0]])
        tv1.append(pos[tris[:, 1]])
        tv2.append(pos[tris[:, 2]])
        tn0.append(nrm[tris[:, 0]])
        tn1.append(nrm[tris[:, 1]])
        tn2.append(nrm[tris[:, 2]])
        tt0.append(uv[tris[:, 0]])
        tt1.append(uv[tris[:, 1]])
        tt2.append(uv[tris[:, 2]])
        tmesh.append(np.full(tris.shape[0], mesh_id, np.int32))

        first_vertex += pos.shape[0]
        first_index += idx.shape[0]
        first_prim += tris.shape[0]

    # texture atlas, quad-packed for a one-gather bilinear fetch: channel
    # blocks are (texel, +x, +y, +xy neighbors), each wrapped at the
    # texture's OWN size before padding, so the shading kernel fetches all
    # four bilinear corners of the wrap-mode sampler with a single gather
    # (TPU gathers cost ~17ns per index regardless of row width — count,
    # not bytes, is what matters)
    imgs = [textures.get(n) for n in tex_names]
    # Missing-file fallback: 1x1 zeros (texture_system.cpp:47-56).
    imgs = [img if img is not None else np.zeros((1, 1, 4), np.float32) for img in imgs]
    if imgs:
        th = max(i.shape[0] for i in imgs)
        tw = max(i.shape[1] for i in imgs)
        atlas = np.zeros((len(imgs), th, tw, 16), np.float32)
        sizes = np.zeros((len(imgs), 2), np.int32)
        for k, img in enumerate(imgs):
            quad = np.concatenate(
                [
                    img,
                    np.roll(img, -1, axis=1),
                    np.roll(img, -1, axis=0),
                    np.roll(img, (-1, -1), axis=(0, 1)),
                ],
                axis=-1,
            )
            atlas[k, : img.shape[0], : img.shape[1], :] = quad
            sizes[k] = (img.shape[1], img.shape[0])
    else:
        atlas = np.zeros((1, 1, 1, 16), np.float32)
        sizes = np.ones((1, 2), np.int32)

    cat = np.concatenate
    return Scene(
        positions=cat(pos_list).astype(np.float32),
        normals=cat(nrm_list).astype(np.float32),
        texcoords=cat(uv_list).astype(np.float32),
        indices=cat(idx_list).astype(np.int32),
        mesh_first_vertex=np.asarray(mfv, np.int32),
        mesh_vertex_count=np.asarray(mvc, np.int32),
        mesh_first_index=np.asarray(mfi, np.int32),
        mesh_index_count=np.asarray(mic, np.int32),
        mesh_texture=np.asarray(mtex, np.int32),
        mesh_kd=np.asarray(mkd, np.float32),
        mesh_first_prim=np.asarray(mfp, np.int32),
        tri_v0=cat(tv0).astype(np.float32),
        tri_v1=cat(tv1).astype(np.float32),
        tri_v2=cat(tv2).astype(np.float32),
        tri_n0=cat(tn0).astype(np.float32),
        tri_n1=cat(tn1).astype(np.float32),
        tri_n2=cat(tn2).astype(np.float32),
        tri_t0=cat(tt0).astype(np.float32),
        tri_t1=cat(tt1).astype(np.float32),
        tri_t2=cat(tt2).astype(np.float32),
        tri_mesh=cat(tmesh).astype(np.int32),
        atlas=atlas,
        atlas_size=sizes,
    )


def _has_textures(scene: Scene) -> bool:
    return bool(np.any(scene.mesh_texture >= 0))


def quantize_atlas(scene: Scene) -> Scene:
    """Repack the f32 quad atlas as rgba8-in-uint32: [N,TH,TW,16] f32 ->
    [N,TH,TW,4] u32, one packed corner per channel.

    The reference samples R8G8B8A8_UNORM textures (texture_system.cpp:58-66
    uploads stbi's 8-bit pixels verbatim), so 8 bits per channel is the
    native texel precision — this is the *more* faithful representation.
    On TPU it quarters the bilinear fetch's gather row (16 B instead of
    64 B per index); `shading.sample_atlas` branches on the dtype and
    unpacks with shifts after the single gather. Exact for 8-bit-grid
    sources (all PNG loads, and the procedural textures which quantize at
    build); lossy-to-8-bit otherwise, like uploading the same data as a
    UNORM texture would be.
    """
    if scene.atlas.dtype == np.uint32:
        return scene
    q = np.round(np.clip(scene.atlas, 0.0, 1.0) * 255.0).astype(np.uint32)
    packed = (
        q[..., 0::4] | (q[..., 1::4] << 8) | (q[..., 2::4] << 16) | (q[..., 3::4] << 24)
    )  # [N,TH,TW,4]: corner c's rgba in channel c
    return scene._replace(atlas=packed)


def merge_scenes(a: Scene, b: Scene) -> Scene:
    """Append scene `b`'s meshes into `a`'s pooled buffers — the analog of
    the reference accumulating every LoadSceneFromOBJ call into its
    persistent geometry pools (asset_load_system.cpp:162-255,
    capsaicin.cpp:65-73: repeated calls ADD to the scene).

    Pooled streams concatenate directly (indices are mesh-local; the mesh
    table's first_vertex/first_index/first_prim offsets shift by `a`'s
    totals). Texture atlases are re-padded to the joint tile size and
    concatenated, with `b`'s texture indices shifted — unless one side has
    no textured mesh at all, in which case its placeholder atlas is dropped
    instead of wasting an atlas slot."""
    cat = np.concatenate

    # atlas merge (placeholder-aware)
    if not _has_textures(b):
        atlas, sizes = a.atlas, a.atlas_size
        b_tex_shift = 0
    elif not _has_textures(a):
        atlas, sizes = b.atlas, b.atlas_size
        b_tex_shift = 0
    else:
        assert a.atlas.dtype == b.atlas.dtype, "mixed atlas formats; quantize_atlas both"
        th = max(a.atlas.shape[1], b.atlas.shape[1])
        tw = max(a.atlas.shape[2], b.atlas.shape[2])
        n = a.atlas.shape[0] + b.atlas.shape[0]
        atlas = np.zeros((n, th, tw, a.atlas.shape[3]), a.atlas.dtype)
        atlas[: a.atlas.shape[0], : a.atlas.shape[1], : a.atlas.shape[2]] = a.atlas
        atlas[a.atlas.shape[0] :, : b.atlas.shape[1], : b.atlas.shape[2]] = b.atlas
        sizes = cat([a.atlas_size, b.atlas_size])
        b_tex_shift = a.atlas.shape[0]

    b_tex = np.where(b.mesh_texture >= 0, b.mesh_texture + b_tex_shift, -1)
    return Scene(
        positions=cat([a.positions, b.positions]),
        normals=cat([a.normals, b.normals]),
        texcoords=cat([a.texcoords, b.texcoords]),
        indices=cat([a.indices, b.indices]),
        mesh_first_vertex=cat(
            [a.mesh_first_vertex, b.mesh_first_vertex + a.positions.shape[0]]
        ).astype(np.int32),
        mesh_vertex_count=cat([a.mesh_vertex_count, b.mesh_vertex_count]),
        mesh_first_index=cat(
            [a.mesh_first_index, b.mesh_first_index + a.indices.shape[0]]
        ).astype(np.int32),
        mesh_index_count=cat([a.mesh_index_count, b.mesh_index_count]),
        mesh_texture=cat([a.mesh_texture, b_tex]).astype(np.int32),
        mesh_kd=cat([a.mesh_kd, b.mesh_kd]),
        mesh_first_prim=cat(
            [a.mesh_first_prim, b.mesh_first_prim + a.tri_v0.shape[0]]
        ).astype(np.int32),
        tri_v0=cat([a.tri_v0, b.tri_v0]),
        tri_v1=cat([a.tri_v1, b.tri_v1]),
        tri_v2=cat([a.tri_v2, b.tri_v2]),
        tri_n0=cat([a.tri_n0, b.tri_n0]),
        tri_n1=cat([a.tri_n1, b.tri_n1]),
        tri_n2=cat([a.tri_n2, b.tri_n2]),
        tri_t0=cat([a.tri_t0, b.tri_t0]),
        tri_t1=cat([a.tri_t1, b.tri_t1]),
        tri_t2=cat([a.tri_t2, b.tri_t2]),
        tri_mesh=cat([a.tri_mesh, b.tri_mesh + a.num_meshes]).astype(np.int32),
        atlas=atlas,
        atlas_size=sizes,
    )


def load_scene_obj(path: str, texture_dir: Optional[str] = None) -> Scene:
    """One-call OBJ -> Scene (public-API analog of LoadSceneFromOBJ,
    capsaicin.cpp:65-73)."""
    from . import textures as tex
    from .obj_loader import load_obj

    meshes, materials = load_obj(path)
    names = {m.texture_name for m in meshes if m.texture_name}
    images = {n: tex.load_texture(n, texture_dir) for n in names}
    return build_scene(meshes, images)
