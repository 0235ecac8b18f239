"""Shading: attribute interpolation, material fetch, lights, Lambert BRDF.

TPU-native reimplementation of the reference's shading headers:
  - scene.h:5-50   InterpolateAttributes (vertex attribute fetch + barycentric
                   interpolation from the pooled buffers)
  - scene.h:52-61  GetMaterial (texture fetch with v-flip + gamma-2.2 decode,
                   constant 0.75 albedo for untextured meshes)
  - lighting.h:20-33  the animated directional light
  - shading.h      Lambert evaluate / pdf / sample

All functions are vectorized over arbitrary pixel/ray batches. `prim` is the
*global* triangle id (the flattened-BVH analog of DXR's InstanceID +
PrimitiveIndex pair); -1 means miss.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import mathops as m
from ..ops import sampling

PI = sampling.PI

# NumPy on purpose: converts at trace time; a module-level jnp constant
# would initialize the device backend at import. rt_direct_lighting.hlsl:56
SKY_COLOR = np.array([0.7, 0.7, 0.85], np.float32)


def _tri_attr_table(scene):
    """[T, 28] packed per-triangle records: positions, normals, texcoords,
    material kd, and texture id — ONE gather fetches everything a hit needs
    instead of ~12 row gathers (dynamic gathers are the dominant TPU cost:
    ~17ns/index regardless of row width). XLA CSEs this concat across the
    passes of a frame."""
    mesh = scene.tri_mesh
    return jnp.concatenate(
        [
            scene.tri_v0, scene.tri_v1, scene.tri_v2,
            scene.tri_n0, scene.tri_n1, scene.tri_n2,
            scene.tri_t0, scene.tri_t1, scene.tri_t2,
            scene.mesh_kd[mesh],
            scene.mesh_texture[mesh].astype(jnp.float32)[..., None],
            mesh.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )


def fetch_hit_attributes(scene, prim, u, v):
    """(global prim id, barycentrics) -> dict with position, shading normal,
    texcoord, material kd, texture id — one gather total.

    Interpolation matches scene.h:5-50: P and UV interpolated with
    (1-u-v, u, v); the normal is normalized after interpolation. Uses the
    flattened triangle SoA (identical values to the pooled indexed fetch).
    """
    import jax

    p = jnp.clip(prim, 0, scene.tri_v0.shape[0] - 1)
    table = _tri_attr_table(scene)
    n_tris = table.shape[0]
    if jax.default_backend() == "tpu" and n_tris <= 128 and p.ndim == 1:
        # small scenes: one-hot MXU lookup beats the row gather ~10x
        from ..ops.pallas_lookup import table_lookup

        attr = table_lookup(table, p)
    else:
        attr = table[p]
    w = (1.0 - u - v)[..., None]
    uu = u[..., None]
    vv = v[..., None]
    pos = attr[..., 0:3] * w + attr[..., 3:6] * uu + attr[..., 6:9] * vv
    nrm = m.normalize(attr[..., 9:12] * w + attr[..., 12:15] * uu + attr[..., 15:18] * vv)
    tx = attr[..., 18:20] * w + attr[..., 20:22] * uu + attr[..., 22:24] * vv
    return {
        "p": pos,
        "n": nrm,
        "tx": tx,
        "kd": attr[..., 24:27],
        "tex": attr[..., 27].astype(jnp.int32),
        "mesh": attr[..., 28].astype(jnp.int32),
    }


def interpolate_attributes(scene, prim, u, v):
    """Compatibility wrapper returning (position, normal, texcoord)."""
    hit = fetch_hit_attributes(scene, prim, u, v)
    return hit["p"], hit["n"], hit["tx"]


def _unpack_rgba8(u):
    """uint32 rgba8 -> [...,4] f32 in [0,1]. Division (not reciprocal
    multiply) so k/255 is correctly rounded — bit-equal to an f32 atlas
    holding round(v*255)/255."""
    b = jnp.stack(
        [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF, (u >> 24) & 0xFF], axis=-1
    )
    return b.astype(jnp.float32) / 255.0


def sample_atlas(atlas, sizes, tex_id, uv):
    """Bilinear, wrap-mode fetch from the quad-packed texture atlas.

    atlas: [N,TH,TW,16] f32 with the four bilinear corners pre-packed per
    texel, or [N,TH,TW,4] uint32 with each corner rgba8-packed
    (scene.quantize_atlas — the reference's own R8G8B8A8_UNORM precision,
    texture_system.cpp:58-66, at a quarter of the gather row bytes);
    sizes: [N,2] (w,h); tex_id: [...] int32 >= 0; uv: [...,2]. Equivalent
    of SampleLevel(g_sampler, tx, 0) on the bindless texture array
    (scene.h:58) — ONE gather per sample instead of four.
    """
    t = jnp.clip(tex_id, 0, atlas.shape[0] - 1)
    wh_i = sizes[t]  # [...,2] i32 (one gather, reused below)
    xy = uv * wh_i.astype(jnp.float32) - 0.5
    ix = jnp.floor(xy[..., 0]).astype(jnp.int32)
    iy = jnp.floor(xy[..., 1]).astype(jnp.int32)
    fx = (xy[..., 0] - jnp.floor(xy[..., 0]))[..., None]
    fy = (xy[..., 1] - jnp.floor(xy[..., 1]))[..., None]
    jx = jnp.mod(ix, wh_i[..., 0])
    jy = jnp.mod(iy, wh_i[..., 1])
    n_, th, tw, c = atlas.shape
    flat = atlas.reshape(n_ * th * tw, c)
    quad = jnp.take(flat, (t * th + jy) * tw + jx, axis=0)
    if atlas.dtype == jnp.uint32:
        v00 = _unpack_rgba8(quad[..., 0])
        v10 = _unpack_rgba8(quad[..., 1])
        v01 = _unpack_rgba8(quad[..., 2])
        v11 = _unpack_rgba8(quad[..., 3])
    else:
        v00 = quad[..., 0:4]
        v10 = quad[..., 4:8]
        v01 = quad[..., 8:12]
        v11 = quad[..., 12:16]
    top = v00 * (1 - fx) + v10 * fx
    bot = v01 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def material_from_hit(scene, hit, use_material_kd: bool = False):
    """Diffuse albedo kd from prefetched hit attributes; scene.h:52-61.

    Untextured meshes -> constant 0.75 (the reference ignores MTL Kd).
    `use_material_kd=True` is our extension that substitutes the MTL Kd.
    Textured: v-flip then bilinear atlas fetch then gamma-2.2 decode. The
    atlas fetch (4 gathers) is skipped entirely when the Scene has no
    textures — statically known from the 1x1 fallback atlas shape.
    """
    tex_id = hit["tex"]
    base = hit["kd"] if use_material_kd else jnp.full_like(hit["kd"], 0.75)
    has_textures = scene.atlas.shape[1] > 1 or scene.atlas.shape[2] > 1
    if has_textures:
        tx = hit["tx"]
        flip = jnp.stack([tx[..., 0], 1.0 - tx[..., 1]], axis=-1)
        tex_rgb = sample_atlas(scene.atlas, scene.atlas_size, tex_id, flip)[..., :3]
        kd = jnp.where((tex_id >= 0)[..., None], tex_rgb, base)
    else:
        kd = base
    return jnp.power(jnp.maximum(kd, 0.0), 2.2)


def get_material(scene, prim, tx, use_material_kd: bool = False):
    """Compatibility wrapper: fetch + material in one call."""
    hit = fetch_hit_attributes(
        scene, prim, jnp.zeros_like(tx[..., 0]), jnp.zeros_like(tx[..., 0])
    )
    hit = dict(hit, tx=tx)
    return material_from_hit(scene, hit, use_material_kd)


def directional_light_sample(frame_count):
    """The animated directional light; lighting.h:20-33.

    Returns (direction [3], intensity [3]). pdf == 1, distance == 1e5.
    """
    fc = jnp.asarray(frame_count)
    t = 2.0 * 3.14 * (fc % 4096).astype(jnp.float32) / 4096.0
    d = jnp.stack([40.0 * jnp.sin(t), jnp.full_like(t, 100.0), 40.0 * jnp.cos(t)], axis=-1)
    d = m.normalize(d)
    intensity = jnp.stack(
        [
            jnp.full_like(t, 28.0),
            jnp.full_like(t, 24.0),
            20.0 + 2.0 + 2.0 * jnp.cos(t),
        ],
        axis=-1,
    )
    return d, intensity


LIGHT_DISTANCE = 100000.0
SHADOW_TMIN = 0.0001  # lighting.h:44


def lambert_eval():
    """1/pi; shading.h:15-18."""
    return 1.0 / PI


def lambert_pdf(n, o):
    """max(0, n.o)/pi; shading.h:20-23."""
    return jnp.maximum(0.0, m.dot(n, o)) / PI


def lambert_sample(s, n):
    """Cosine-power (e=1) hemisphere sample; shading.h:25-33.

    Returns (direction, brdf scalar, pdf).
    """
    d = sampling.map_to_hemisphere(s, n, 1.0)
    return d, lambert_eval(), lambert_pdf(n, d)


def direct_illumination_terms(p, n, kd, frame_count):
    """The unshadowed NEE integrand + the shadow ray to trace.

    Splits CalculateDirectIllumination (lighting.h:35-61) into the pure math
    (here) and the visibility query (caller traces any-hit with tmin=1e-4).
    Returns (shadow_dir broadcast to p's shape, unshadowed_rgb).
    """
    ldir, li = directional_light_sample(frame_count)
    ldir = jnp.broadcast_to(ldir, p.shape)
    ndotl = jnp.maximum(0.0, m.dot(n, ldir))
    unshadowed = li * kd * lambert_eval() * ndotl[..., None]
    return ldir, unshadowed
